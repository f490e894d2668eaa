package graft.schema

import org.apache.spark.sql.types._

/** Schema for the Gmail message resource — the fields the reference
  * pipeline actually reads (SURVEY.md §1.1; reference
  * resources/gmail_functions.py:169,171,266-270,286).
  *
  * Spark SQL has no recursive StructType, so the recursive `parts` tree
  * (multipart/alternative inside multipart/mixed inside multipart/related)
  * is unrolled to a fixed depth. [[PartsDepth]] = 4 covers every real
  * multipart nesting the Gmail API produces (alternative-in-related-in-
  * mixed is depth 3); the fixture suite includes a depth-3 body chunk to
  * pin this (FIXTURES.md §2).
  */
object GmailSchema {
  /** Unroll depth for the parts tree. */
  val PartsDepth = 4

  val headerType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("value", StringType)))

  val bodyType: StructType = StructType(Seq(
    StructField("size", LongType),
    StructField("data", StringType)))

  private def partType(depth: Int): StructType = {
    val base = Seq(
      StructField("partId", StringType),
      StructField("mimeType", StringType),
      StructField("filename", StringType),
      StructField("headers", ArrayType(headerType)),
      StructField("body", bodyType))
    if (depth <= 0) StructType(base)
    else StructType(base :+
      StructField("parts", ArrayType(partType(depth - 1))))
  }

  val payloadType: StructType = StructType(Seq(
    StructField("partId", StringType),
    StructField("mimeType", StringType),
    StructField("filename", StringType),
    StructField("headers", ArrayType(headerType)),
    StructField("body", bodyType),
    StructField("parts", ArrayType(partType(PartsDepth - 1)))))

  /** messages.get resource (one email). */
  val messageType: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("threadId", StringType),
    StructField("labelIds", ArrayType(StringType)),
    StructField("snippet", StringType),
    StructField("historyId", StringType),
    StructField("internalDate", StringType),
    StructField("payload", payloadType),
    StructField("sizeEstimate", LongType)))

  /** messages.list response page (reference gmail_functions.py:165-169). */
  val listPageType: StructType = StructType(Seq(
    StructField("messages", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("threadId", StringType))))),
    StructField("nextPageToken", StringType),
    StructField("resultSizeEstimate", LongType)))

  /** Formatted (stage-1) record — union of keys the reference emits
    * (gmail_functions.py:265-305), as one fixed nullable schema.
    */
  val formattedType: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("mimeType", StringType),
    StructField("subject", StringType),
    StructField("date_string", StringType),
    StructField("from", StringType),
    StructField("body", StringType),
    StructField("role", StringType),
    StructField("org", StringType),
    StructField("location", StringType)))

  /** Dedup-state table `emails(id, date)` (reference init.sql:25-28). */
  val stateType: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("date", DateType)))
}
