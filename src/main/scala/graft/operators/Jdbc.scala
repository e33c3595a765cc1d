package graft.operators

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC row-store load path — the reference's L1 stage
  * (scripts/load_parquet_to_postgres_l1.py:37-61,124-149): create the
  * table if absent with a declared primary key, then batched
  * last-write-wins upserts on that key.
  *
  * Spark's built-in JDBC sink only appends or truncates; upsert
  * requires statement-level control, so the write runs as a
  * `foreachPartition` — one connection per input partition, batched
  * statements, one commit per partition. That is the distributed
  * shape of the reference's single `execute_values` loop: at cluster
  * scale each executor streams its partition into the store
  * concurrently, and total throughput is bounded by the row store,
  * not by Spark (which is why the 100 TB lake path in [[Merge]] /
  * [[Sinks.stageAndReplace]] exists — this sink is for serving-store
  * loads of aggregated/merged results, not for the raw fact stream).
  *
  * Upsert statement dialects:
  *  - Postgres-family URLs use the reference's own
  *    `INSERT ... ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col`
  *    (load_parquet_to_postgres_l1.py:52-61) — one atomic statement.
  *  - Everything else (Derby in the test suite) gets the portable
  *    DELETE-by-PK + INSERT pair inside the same transaction — the
  *    same last-write-wins result wherever ON CONFLICT is missing.
  *
  * Input rows must be PK-unique (run [[Merge.keepLatest]] first, as
  * the reference dedupes upstream): duplicate keys within one load
  * are a data bug this sink surfaces as a constraint violation
  * rather than silently resolving in partition-arrival order.
  */
object Jdbc {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** How an upsert is phrased for a given backend. */
  sealed trait UpsertDialect {
    /** Single-statement atomic upsert, if the backend has one. */
    def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): Option[String]
  }

  /** `INSERT ... ON CONFLICT DO UPDATE` — Postgres and compatibles. */
  case object PostgresDialect extends UpsertDialect {
    def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): Option[String] = {
      val sets = cols.filterNot(pkCols.contains)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      Some(s"""INSERT INTO $table (${cols.mkString(", ")})
              |VALUES (${cols.map(_ => "?").mkString(", ")})
              |ON CONFLICT (${pkCols.mkString(", ")}) DO UPDATE SET $sets""".stripMargin)
    }
  }

  /** Portable DELETE + INSERT inside one transaction, for backends
    * without a native upsert statement (Derby, older row stores). */
  case object DeleteInsertDialect extends UpsertDialect {
    def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): Option[String] = None
  }

  def dialectFor(url: String): UpsertDialect =
    if (url.startsWith("jdbc:postgresql:")) PostgresDialect else DeleteInsertDialect

  /** Spark type → portable SQL column type (the reference's DDL dtype
    * table, load_parquet_to_postgres_l1.py:37-50, generalized). */
  private[graft] def sqlType(dt: DataType): String = dt match {
    case LongType            => "BIGINT"
    case IntegerType         => "INTEGER"
    case ShortType           => "SMALLINT"
    case ByteType            => "SMALLINT"
    case DoubleType          => "DOUBLE PRECISION"
    case FloatType           => "REAL"
    case BooleanType         => "BOOLEAN"
    case TimestampType       => "TIMESTAMP"
    case TimestampNTZType    => "TIMESTAMP"
    case DateType            => "DATE"
    case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
    case StringType          => "VARCHAR(4000)"
    case other => throw new IllegalArgumentException(
      s"writeJdbcUpsert: no portable SQL mapping for ${other.simpleString}")
  }

  private[graft] def createTableSql(table: String, schema: StructType,
                                    pkCols: Seq[String]): String = {
    val colDefs = schema.fields.map { f =>
      val notNull = if (pkCols.contains(f.name)) " NOT NULL" else ""
      s"${f.name} ${sqlType(f.dataType)}$notNull"
    }
    s"""CREATE TABLE $table (
       |  ${colDefs.mkString(",\n  ")},
       |  PRIMARY KEY (${pkCols.mkString(", ")})
       |)""".stripMargin
  }

  /** DDL-if-absent: probe the catalog (portably — not every backend
    * has CREATE TABLE IF NOT EXISTS) and create with the PK when the
    * table is missing. */
  private def ensureTable(conn: Connection, table: String, schema: StructType,
                          pkCols: Seq[String]): Unit = {
    val md = conn.getMetaData
    // Case-fold the probe per the BACKEND's identifier storage rule
    // (Derby stores unquoted identifiers upper-case, Postgres folds
    // them lower-case — a fixed .toUpperCase probe never sees an
    // existing Postgres table, so every rerun re-issues CREATE TABLE
    // and dies on 'relation already exists'; r4 advice).
    val fold: String => String =
      if (md.storesUpperCaseIdentifiers) _.toUpperCase
      else if (md.storesLowerCaseIdentifiers) _.toLowerCase
      else identity
    val (schemaPart, tablePart) = table.split('.') match {
      case Array(s, t) => (fold(s), fold(t))
      case Array(t)    => (null, fold(t))
      case _ => throw new IllegalArgumentException(s"bad table name: $table")
    }
    // getTables treats its arguments as LIKE patterns: an unescaped
    // '_' in a table name matches any character ("events_l1" would
    // match a pre-existing "eventsXl1" and skip the CREATE), and a
    // null schema searches EVERY schema. Pattern ESCAPING is not
    // portable (Derby reports an empty escape string and ignores
    // backslashes), so instead: probe with the raw pattern — which can
    // only OVER-match — pin the schema to the connection's current one
    // when unqualified, and confirm an EXACT name match on the result
    // rows before trusting existence.
    // getSchema is JDBC 4.1-optional: pre-4.1 drivers throw
    // AbstractMethodError (an Error, hence the Throwable catch) or
    // SQLFeatureNotSupported — fall back to a cross-schema probe
    // there, which is the pre-round-5 behavior for those backends
    val wantSchema = Option(schemaPart).orElse(
      try Option(conn.getSchema) catch { case _: Throwable => None })
    // Diagnosability (r5 advice): with no schema pin the probe matches
    // a same-named table in ANY schema — CREATE is then skipped and
    // the subsequent insert fails with a confusing missing-table
    // error. Can't fix portably (pre-4.1 drivers have no getSchema),
    // but the warning names the failure mode when it happens.
    if (wantSchema.isEmpty)
      log.warn(s"ensureTable($table): driver reports no current " +
        "schema; existence probe is CROSS-SCHEMA — a same-named " +
        "table in another schema will suppress CREATE TABLE here " +
        "and the write will fail on the missing table. Qualify the " +
        "table name (schema.table) to pin the probe.")
    val rs = md.getTables(null, wantSchema.orNull, tablePart, Array("TABLE"))
    val exists =
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME") == tablePart &&
            wantSchema.forall(_ == rs.getString("TABLE_SCHEM"))
        found
      } finally rs.close()
    if (!exists) {
      val st = conn.createStatement()
      try st.executeUpdate(createTableSql(table, schema, pkCols))
      finally st.close()
    }
  }

  /** Concrete java.sql type for setNull — Derby (unlike Postgres)
    * rejects the generic Types.NULL placeholder. */
  private def jdbcType(dt: DataType): Int = dt match {
    case LongType       => java.sql.Types.BIGINT
    case IntegerType    => java.sql.Types.INTEGER
    case ShortType | ByteType => java.sql.Types.SMALLINT
    case DoubleType     => java.sql.Types.DOUBLE
    case FloatType      => java.sql.Types.REAL
    case BooleanType    => java.sql.Types.BOOLEAN
    case TimestampType  => java.sql.Types.TIMESTAMP
    case DateType       => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _              => java.sql.Types.VARCHAR
  }

  private def bind(ps: PreparedStatement, row: org.apache.spark.sql.Row,
                   fieldIdx: Seq[Int], schema: StructType): Unit =
    fieldIdx.zipWithIndex.foreach { case (fi, pi) =>
      if (row.isNullAt(fi)) ps.setNull(pi + 1, jdbcType(schema(fi).dataType))
      else schema(fi).dataType match {
        case TimestampType => ps.setTimestamp(pi + 1, row.getAs[java.sql.Timestamp](fi))
        case DateType      => ps.setDate(pi + 1, row.getAs[java.sql.Date](fi))
        case _             => ps.setObject(pi + 1, row.get(fi))
      }
    }

  /** Batched last-write-wins upsert of `df` into `table` keyed on
    * `pkCols`, creating the table (with the PK) when absent. Returns
    * the number of rows written. Executor-parallel: one connection and
    * one transaction per input partition. */
  def writeJdbcUpsert(df: DataFrame, url: String, table: String, pkCols: Seq[String],
                      batchSize: Int = 5000,
                      connectionProps: Map[String, String] = Map.empty): Long = {
    require(pkCols.nonEmpty, "writeJdbcUpsert: pkCols must be non-empty")
    val schema = df.schema
    val missing = pkCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"writeJdbcUpsert: pk columns not in frame: $missing")

    val props = new java.util.Properties()
    connectionProps.foreach { case (k, v) => props.setProperty(k, v) }

    // DDL once, on the driver, before any executor connects
    val driverConn = DriverManager.getConnection(url, props)
    try ensureTable(driverConn, table, schema, pkCols)
    finally driverConn.close()

    val cols = schema.fieldNames.toSeq
    val upsert = dialectFor(url).upsertSql(table, cols, pkCols)
    val deleteSql = s"DELETE FROM $table WHERE " +
      pkCols.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val pkIdx = pkCols.map(schema.fieldIndex).toIndexedSeq
    val allIdx = cols.indices
    val written = df.sparkSession.sparkContext.longAccumulator("jdbc_upsert_rows")
    val propsMap = connectionProps // serializable capture (Properties is not)

    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val p = new java.util.Properties()
        propsMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          upsert match {
            case Some(sql) =>
              val ps = conn.prepareStatement(sql)
              try rows.grouped(batchSize).foreach { chunk =>
                chunk.foreach { r => bind(ps, r, allIdx, schema); ps.addBatch() }
                ps.executeBatch()
                written.add(chunk.size)
              } finally ps.close()
            case None =>
              val del = conn.prepareStatement(deleteSql)
              val ins = conn.prepareStatement(insertSql)
              try rows.grouped(batchSize).foreach { chunk =>
                chunk.foreach { r => bind(del, r, pkIdx, schema); del.addBatch() }
                del.executeBatch()
                chunk.foreach { r => bind(ins, r, allIdx, schema); ins.addBatch() }
                ins.executeBatch()
                written.add(chunk.size)
              } finally { del.close(); ins.close() }
          }
          conn.commit()
        } catch {
          case t: Throwable =>
            // rollback on an already-broken connection throws too —
            // attach it as suppressed so the ORIGINAL failure is what
            // logs and retries see (r4 advice)
            try conn.rollback()
            catch { case r: Throwable => t.addSuppressed(r) }
            throw t
        } finally conn.close()
      }
    }
    written.value
  }

  /** JDBC source (the reference's L1→L2 read side,
    * scripts/sql/l2_tables/upsert_l2_for_ds.sql runs against L1).
    * Single-partition read by default; pass `partitionColumn` +
    * bounds to fan the scan out across executors for big tables. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: Option[String] = None,
               lowerBound: Long = 0L, upperBound: Long = 0L,
               numPartitions: Int = 8,
               connectionProps: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(connectionProps)
    partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
        .load()
      case None => base.load()
    }
  }
}
