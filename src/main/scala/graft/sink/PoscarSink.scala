package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Dataset
import graft.echem.{PoscarCodec, Schemas}
import Schemas.Slab

/** File-per-row POSCAR sink (op #5): the reference writes one
  * `.poscar` per structure onto a shared volume
  * (`Poscar(bulk).write_file(...)`, `dags/my_dag.py:39-44,94-97`).
  *
  * `foreachPartition` writer — rendering and IO happen on executors;
  * the target must be a shared filesystem (the reference's mounted
  * volume; NFS/object-store FUSE at cluster scale). File-per-row is
  * the REFERENCE's contract — for engine-internal handoffs prefer
  * parquet of the Slab struct (see Pipeline, which never
  * materializes between stages at all).
  *
  * Key contract: `mpKey` names the file, so DUPLICATE keys collapse
  * to one file, last rename wins — fine for retries rewriting
  * identical content (the designed case), silently lossy for
  * distinct-content duplicates. Dedup upstream when keys may repeat
  * (the SlabGen key scheme makes them unique by construction).
  */
object PoscarSink {

  def write(slabs: Dataset[Slab], dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    slabs.foreachPartition { (it: Iterator[Slab]) =>
      it.foreach { s =>
        // write-to-temp + atomic rename: a task retry or speculative
        // twin writing the same mpKey must never interleave bytes in
        // the visible file — readers see either the old complete
        // content or the new complete content (last rename wins).
        // The temp name carries a UUID so two concurrent writers
        // cannot collide on the staging file either.
        val target = Paths.get(dir, s"${s.mpKey}.poscar")
        val tmp = Paths.get(dir,
          s".${s.mpKey}.poscar.${java.util.UUID.randomUUID()}.tmp")
        // any failure between staging and the move must not leave
        // UUID-named .tmp litter accumulating in the shared dir —
        // a killed speculative task never retries under the same
        // temp name, so nothing else would ever clean it
        try {
          Files.write(tmp, PoscarCodec.render(s).getBytes(StandardCharsets.UTF_8))
          try
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          catch {
            case _: java.nio.file.AtomicMoveNotSupportedException =>
              // object-store FUSE mounts may lack atomic rename; the
              // plain replace still avoids CREATE+TRUNCATE streaming
              // of the render, but Files.move may internally degrade
              // to copy+delete there — a concurrent reader CAN then
              // observe a missing/partial file. On such mounts the
              // atomicity guarantee is only as good as the mount's
              // rename; stage-then-move is the best portable form.
              Files.move(tmp, target,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } catch {
          case t: Throwable =>
            try Files.deleteIfExists(tmp) catch { case _: Exception => () }
            throw t
        }
      }
    }
  }
}
