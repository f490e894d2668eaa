package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core transform chain under the DuckDB oracle gate.
  *
  * `q_email_pipeline` runs [[graft.pipeline.GmailPipeline.formatMessages]]
  * — header-map extract (P1/P2) → subject/date/from parse (F5-F7) →
  * recursive base64 body assembly (F1/F2/A1) → HTML strip + ASCII cleanup
  * (F3/F4) → sender-dispatched Indeed positional extract (P3/X1) — the
  * whole of reference gmail_functions.py:265-303 — over a deterministic
  * inline fixture message set, and the oracle twin recomputes every output
  * value from the SAME literal ingredients with DuckDB string/list
  * functions. The driver tables carry no Gmail-shaped messages, so this
  * inline-fixture query is what puts the Gmail semantics core (previously
  * ScalaTest-only: EmailOpsSpec/PipelineSpec golden + property tests)
  * under the per-round hash gate.
  *
  * Fixture coverage, one message per regime:
  *  - m1: single-part HTML body; style subtree + comment stripped; entity
  *    decode; RFC-2822 date with DOW prefix, zone AND "(UTC)" comment;
  *    Indeed sender → positional (role, org, location) extract from the
  *    dir=rtl container (flat <p> siblings — document order = regex order
  *    in both engines).
  *  - m2: depth-3 multipart tree (own data → child → grandchild,
  *    pre-order space-join); duplicate Subject headers with differing
  *    case (LAST match wins, gmail_functions.py:271-283); ISO date;
  *    interior newline + non-ASCII char removed by the F4 cleanup;
  *    numeric entity.
  *  - m3: payload entirely absent — every lookup null-safe, body ''.
  *  - m4: unparseable Date → NULL date_string; script subtree stripped;
  *    non-Indeed sender → all-null extract struct.
  */
object EmailPipeline {

  // urlsafe-base64 of the fixture bodies (generated offline; the decoded
  // text is restated in the oracle's expected values via SQL transforms,
  // so an encoding mistake fails the hash, not silently passes)
  private val M1Body =
    "PGh0bWw-PGJvZHk-PHN0eWxlPnB7Y29sb3I6cmVkfTwvc3R5bGU-PCEtLSBwcm9tbyAtLT48cD5IaSw8L3A-PGRpdiBkaXI9InJ0bCI-PHA-QXBwbGljYXRpb24gc3VibWl0dGVkPC9wPjxwPkRhdGEgRW5naW5lZXI8L3A-PHA-YXBwbGllZCB2aWEgSW5kZWVkIC0gUmVtb3RlLCBVUzwvcD48cD5HcmFmdCBBbmFseXRpY3MgJmFtcDsgQ288L3A-PC9kaXY-PC9ib2R5PjwvaHRtbD4="
  private val M2C0 = "VGVhbSB1cGRhdGUKbnVtYmVycyBhdHRhY2hlZA=="
  private val M2C1 = "PHA-UHJvZml0ICZhbXA7IGxvc3M6IHVzZXImIzY0O2NvcnA8L3A-"
  private val M2C2 = "Y2Fmw6kgc3VtbWFyeQ=="
  private val M4Body =
    "PHNjcmlwdD52YXIgeD0xOzwvc2NyaXB0PjxwPlN0YXR1czogb2sgLSBkb25lPC9wPjxhIGhyZWY9Imh0dHA6Ly9lLngiPmxpbms8L2E-"

  /** The fixture messages as Gmail messages.get JSON (schema
    * [[graft.schema.GmailSchema.messageType]]).
    */
  private val fixtureJson: Seq[String] = Seq(
    s"""{"id":"m1","threadId":"t1","payload":{"mimeType":"text/html","headers":[{"name":"From","value":"Indeed Apply <indeedapply@indeed.com>"},{"name":"Subject","value":"Indeed Application: Data Engineer"},{"name":"Date","value":"Tue, 5 Mar 2024 10:15:30 +0000 (UTC)"}],"body":{"size":220,"data":"$M1Body"}}}""",
    s"""{"id":"m2","threadId":"t2","payload":{"mimeType":"multipart/mixed","headers":[{"name":"Subject","value":"Quarterly report"},{"name":"subject","value":"Quarterly report v2"},{"name":"From","value":"Alice Smith <alice@example.com>"},{"name":"Date","value":"2024-03-05T10:15:30"}],"body":{"size":28,"data":"$M2C0"},"parts":[{"partId":"0","mimeType":"text/html","body":{"size":40,"data":"$M2C1"}},{"partId":"1","mimeType":"multipart/alternative","body":{"size":0},"parts":[{"partId":"1.0","mimeType":"text/plain","body":{"size":12,"data":"$M2C2"}}]}]}}""",
    """{"id":"m3","threadId":"t3"}""",
    s"""{"id":"m4","threadId":"t4","payload":{"mimeType":"text/html","headers":[{"name":"From","value":"Bob <bob@ex.org>"},{"name":"Subject","value":"Status update"},{"name":"Date","value":"not a date"}],"body":{"size":100,"data":"$M4Body"}}}""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_email_pipeline" -> ((s, _) => {
      import s.implicits._
      val msgs = s.createDataset(fixtureJson).toDF("json")
        .select(from_json(col("json"),
          graft.schema.GmailSchema.messageType).as("m"))
        .select(col("m.*"))
      graft.pipeline.GmailPipeline.formatMessages(msgs).orderBy(col("id"))
    }))

  /** The oracle recomputes the chain with DuckDB primitives from the same
    * literals: list-of-struct header lookup (last match, lower-cased
    * name), split/replace/trim from-parse, regex zone-strip +
    * try_strptime ladder, urlsafe-b64 decode + space-join, the spec'd
    * HTML→text (script/style/comment subtree removal, split on tags,
    * per-node trim, ''-join, entity decode), ASCII/CRLF cleanup, and the
    * positional rtl-container extract. Entity decode is the fixture's
    * entity set as explicit replaces (DuckDB lacks the named-entity map;
    * the fixture pins &amp;/&#64;/&nbsp;).
    */
  val oracle: Map[String, String] = Map(
    "q_email_pipeline" ->
      s"""WITH fx(id, mime_type, hdrs, chunks) AS (VALUES
         |  ('m1', 'text/html',
         |   [{'name': 'From', 'value': 'Indeed Apply <indeedapply@indeed.com>'},
         |    {'name': 'Subject', 'value': 'Indeed Application: Data Engineer'},
         |    {'name': 'Date', 'value': 'Tue, 5 Mar 2024 10:15:30 +0000 (UTC)'}],
         |   ['$M1Body']),
         |  ('m2', 'multipart/mixed',
         |   [{'name': 'Subject', 'value': 'Quarterly report'},
         |    {'name': 'subject', 'value': 'Quarterly report v2'},
         |    {'name': 'From', 'value': 'Alice Smith <alice@example.com>'},
         |    {'name': 'Date', 'value': '2024-03-05T10:15:30'}],
         |   ['$M2C0', '$M2C1', '$M2C2']),
         |  ('m3', NULL, NULL, NULL),
         |  ('m4', 'text/html',
         |   [{'name': 'From', 'value': 'Bob <bob@ex.org>'},
         |    {'name': 'Subject', 'value': 'Status update'},
         |    {'name': 'Date', 'value': 'not a date'}],
         |   ['$M4Body'])),
         |hv AS (SELECT id, mime_type, chunks,
         |    list_filter(hdrs, h -> lower(h.name) = 'subject')[-1].value
         |      AS subject,
         |    list_filter(hdrs, h -> lower(h.name) = 'from')[-1].value
         |      AS from_raw,
         |    list_filter(hdrs, h -> lower(h.name) = 'date')[-1].value
         |      AS date_raw
         |  FROM fx),
         |dt AS (SELECT *,
         |    trim(replace(list_extract(string_split(from_raw, '<'), -1),
         |      '>', '')) AS from_addr,
         |    regexp_replace(regexp_replace(regexp_replace(date_raw,
         |      '^\\s*[A-Za-z]{3},\\s*', ''), '\\s*\\([^)]*\\)\\s*$$', ''),
         |      '\\s+([+-][0-9]{4}|[A-Z]{2,5})$$', '') AS date_naive
         |  FROM hv),
         |dp AS (SELECT *,
         |    coalesce(try_strptime(date_naive, '%-d %b %Y %H:%M:%S'),
         |             try_strptime(date_naive, '%-d %b %Y %H:%M'),
         |             try_strptime(date_naive, '%Y-%m-%dT%H:%M:%S'),
         |             try_strptime(date_naive, '%Y-%m-%d %H:%M:%S'),
         |             try_strptime(date_naive, '%m/%d/%Y %H:%M:%S')) AS ts
         |  FROM dt),
         |bd AS (SELECT *,
         |    coalesce(array_to_string(list_transform(chunks,
         |      c -> decode(from_base64(replace(replace(c, '-', '+'),
         |        '_', '/')))), ' '), '') AS raw_body
         |  FROM dp),
         |st AS (SELECT *,
         |    regexp_replace(regexp_replace(regexp_replace(raw_body,
         |      '(?is)<script[^>]*>.*?</script\\s*>', '', 'g'),
         |      '(?is)<style[^>]*>.*?</style\\s*>', '', 'g'),
         |      '(?s)<!--.*?-->', '', 'g') AS nos
         |  FROM bd),
         |tx AS (SELECT *,
         |    replace(replace(replace(coalesce(array_to_string(list_filter(
         |      list_transform(regexp_split_to_array(nos, '<[^>]*>'),
         |        x -> trim(x)), x -> x <> ''), ''), ''),
         |      '&amp;', '&'), '&#64;', '@'), '&nbsp;', ' ') AS joined
         |  FROM st),
         |cb AS (SELECT *,
         |    regexp_replace(regexp_replace(joined, '[^\\x00-\\x7F]', '', 'g'),
         |      '[\\r\\n]', '', 'g') AS body
         |  FROM tx),
         |ind AS (SELECT *,
         |    CASE WHEN from_addr = 'indeedapply@indeed.com' THEN
         |      list_transform(regexp_extract_all(
         |        regexp_replace(raw_body, '(?s)^.*?<div dir="rtl">', ''),
         |        '(?is)<p\\b[^>]*>(.*?)</p\\s*>', 1),
         |        x -> replace(replace(replace(trim(x), '&amp;', '&'),
         |          '&#64;', '@'), '&nbsp;', ' '))
         |    END AS els
         |  FROM cb)
         |SELECT id, mime_type AS "mimeType", subject,
         |  strftime(ts, '%m/%d/%y %H:%M:%S') AS date_string,
         |  from_addr AS "from", body,
         |  els[2] AS role, els[4] AS org,
         |  string_split(els[3], ' - ')[2] AS location
         |FROM ind ORDER BY id""".stripMargin)
}
