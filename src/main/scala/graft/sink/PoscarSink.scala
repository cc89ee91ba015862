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
        Files.write(
          Paths.get(dir, s"${s.mpKey}.poscar"),
          PoscarCodec.render(s).getBytes(StandardCharsets.UTF_8))
      }
    }
  }
}
