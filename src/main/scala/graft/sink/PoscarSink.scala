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
        Files.write(tmp, PoscarCodec.render(s).getBytes(StandardCharsets.UTF_8))
        try
          Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch {
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            // object-store FUSE mounts may lack atomic rename; a
            // plain replace is still torn-write-safe vs CREATE+
            // TRUNCATE because the content was staged fully first
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
  }
}
