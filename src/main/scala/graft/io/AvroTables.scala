package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.DiffConfig
import graft.sources.avro.AvroFileFormat

/** Config-driven Avro loader — the programmatic entry the reference's
  * `setConfig({schema, keep, ignore})` + `extractRows` pair provides
  * (`/root/reference/src/config.js:8-12`, `src/index.js:393-401`):
  *
  *   - `cfg.schema` (an Avro JSON reader schema) is passed to the source
  *     as the `avroSchema` option, so the DECODER applies it — fields
  *     absent from the reader schema are skipped, not decoded-then-dropped,
  *     and the writer schema is never consulted for shape.
  *   - `cfg.keepFields` / `cfg.ignoreFields` apply as a Catalyst
  *     projection, which column pruning pushes back into the scan's
  *     reader schema — same decode-skip effect, driven by the plan.
  *
  * Unlike the reference's global mutable CONFIG, the config travels with
  * the call — two loads with different configs can coexist in one query.
  */
object AvroTables {

  def load(spark: SparkSession, path: String,
      cfg: DiffConfig = DiffConfig()): DataFrame = {
    val reader = spark.read.format("avro")
    val withSchema = cfg.schema match {
      case Some(json) => reader.option(AvroFileFormat.SchemaOption, json)
      case None => reader
    }
    cfg.project(withSchema.load(path))
  }
}
