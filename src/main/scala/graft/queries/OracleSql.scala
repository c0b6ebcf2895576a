package graft.queries

/** Shared DuckDB SQL fragments for the cross-engine FP-parity oracles.
  *
  * Round-13 consolidation: the cosine fragment existed as THREE private
  * copies (Ext9Queries, LlmQueries, Ext15Queries) that had already
  * cosmetically drifted — a parity-critical fix applied to one would
  * silently miss the others. One definition keeps the bit-for-bit
  * replay contract auditable in one place.
  */
private[queries] object OracleSql {

  /** Sequential double-precision cosine over two DuckDB list expressions —
    * the exact arithmetic order of [[graft.functions.CosineSimilarity]]
    * (left-to-right accumulation, dot / (sqrt·sqrt)). A zero-norm side
    * divides 0.0/0.0, which DuckDB evaluates to NULL — the same dead-vector
    * convention as the native expression, so consumers must carry an
    * explicit `IS NOT NULL` guard wherever the Spark side filters
    * `cos.isNotNull` (the top-k rankers do).
    */
  def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |   * sqrt(list_sum(list_transform(range(1, len($b) + 1),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin
}
