package graft.jobs

/** Shared DuckDB-oracle SQL fragments. The engine-portable hash contract
  * (`Dedup.md5Long`: first 8 md5-hex chars as BIGINT) restated in DuckDB's
  * dialect — positional strpos arithmetic because DuckDB has no
  * hex-to-int conv() — so every job's oracle derives the identical hash.
  */
object OracleSql {

  /** DuckDB: 8 md5-hex chars of `inner` starting at `from` as BIGINT. */
  def hexIntSqlAt(inner: String, from: Int): String =
    (1 to 8).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($inner),${from + i - 1},1))-1) * ${math.pow(16, 8 - i).toLong}::BIGINT"
    }.mkString("(", " + ", ")")

  /** DuckDB: first 8 md5-hex chars of `inner` as BIGINT. */
  def hexIntSql(inner: String): String = hexIntSqlAt(inner, 1)

  /** DuckDB: first 15 md5-hex chars of `inner` as a 60-bit BIGINT (the
    * `hash60` convention — wide enough that sums/xors of realistic key
    * sets stay collision-free while never touching the sign bit).
    */
  def hex60Sql(inner: String): String =
    (1 to 15).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($inner),$i,1))-1) * ${math.pow(16, 15 - i).toLong}::BIGINT"
    }.mkString("(", " + ", ")")
}
