package graft.queries

/** DuckDB CTE fragments replaying [[graft.ops.RepetitionSignals]] for
  * the t26/c21 oracles — each fragment recomputes one signal family
  * from scratch (its own tokenization, grouping and argmax), mirroring
  * the kernel's documented definitions term for term:
  *
  *  - grams join tokens with `chr(1)` and recover character length as
  *    `len(gram) − (n−1)`, exactly the kernel's `cp(key) − (n−1)`;
  *  - the top-n-gram argmax ties break by larger gram length via a
  *    max-count join + `max(gl)` (DuckDB's `max_by` cannot take a
  *    lexicographic list key);
  *  - dup-n-gram coverage unions token POSITIONS (`DISTINCT (doc,
  *    pos)`) before summing token lengths, the kernel's boolean-array
  *    walk;
  *  - all fragments assume a `toks(doc_id, tk)` CTE tokenized with the
  *    `[^ \t\n\f\r]+` class over non-NULL text.
  */
private[queries] object GopherSql {

  /** `top$n(doc_id, num)` — `num = count·chars` of the most frequent
    * n-gram, 0 when nothing repeats. Emits 3 chained CTE definitions
    * (no leading/trailing comma).
    */
  def topGramCtes(n: Int): String =
    s"""g$n AS (
       |  SELECT doc_id,
       |    list_aggregate(tk[i:i+${n - 1}], 'string_agg', chr(1)) AS gram
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - ${n - 2})) AS i
       |        FROM toks)),
       |c$n AS (
       |  SELECT doc_id, gram, count(*) AS c, len(gram) - ${n - 1} AS gl
       |  FROM g$n GROUP BY 1, 2),
       |mx$n AS (SELECT doc_id, max(c) AS mc FROM c$n GROUP BY 1),
       |top$n AS (
       |  SELECT c.doc_id,
       |    CASE WHEN m.mc >= 2 THEN m.mc * max(c.gl) ELSE 0 END AS num
       |  FROM c$n c JOIN mx$n m ON c.doc_id = m.doc_id AND c.c = m.mc
       |  GROUP BY c.doc_id, m.mc)""".stripMargin

  /** `dup$n(doc_id, cc)` — characters covered by any n-gram occurring
    * at least twice (position-union, no double counting).
    */
  def dupGramCtes(n: Int): String =
    s"""gd$n AS (
       |  SELECT doc_id, i,
       |    list_aggregate(tk[i:i+${n - 1}], 'string_agg', chr(1)) AS gram
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - ${n - 2})) AS i
       |        FROM toks)),
       |cd$n AS (SELECT doc_id, gram, count(*) AS c FROM gd$n GROUP BY 1, 2),
       |cov$n AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT g.doc_id, unnest(range(g.i, g.i + $n)) AS pos
       |    FROM gd$n g JOIN cd$n c USING (doc_id, gram)
       |    WHERE c.c >= 2)),
       |dup$n AS (
       |  SELECT v.doc_id, sum(len(t.tk[v.pos]))::DOUBLE AS cc
       |  FROM cov$n v JOIN toks t USING (doc_id) GROUP BY 1)""".stripMargin

  /** `${name}stat(doc_id, f, cf)` — duplicate-unit fraction and
    * duplicate-character fraction over `unitsExpr`, a SQL expression
    * producing the unit list from column `t` of CTE `base`. Empty
    * units are dropped before grouping (the kernel's `nonEmpty`
    * filter).
    */
  def unitDupCtes(name: String, unitsExpr: String): String =
    s"""${name}u AS (
       |  SELECT doc_id, x AS u FROM (
       |    SELECT doc_id, unnest($unitsExpr) AS x FROM base)
       |  WHERE x <> ''),
       |${name}stat AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END)::DOUBLE / sum(c) AS f,
       |    CASE WHEN sum(c * l) = 0 THEN 0.0
       |         ELSE sum(CASE WHEN c >= 2 THEN (c - 1) * l ELSE 0 END)::DOUBLE
       |              / sum(c * l) END AS cf
       |  FROM (SELECT doc_id, u, count(*) AS c, len(u) AS l
       |        FROM ${name}u GROUP BY 1, 2)
       |  GROUP BY 1)""".stripMargin

  /** A guarded `signal / total-chars` projection term (0 when the
    * document has no token characters), rounded when `digits >= 0`.
    */
  def charFrac(numExpr: String, round: Int = -1): String = {
    val frac = s"CASE WHEN tt.tc = 0 THEN 0.0 ELSE $numExpr / tt.tc END"
    if (round >= 0) s"round($frac, $round)" else frac
  }
}
