package graft.model

import java.sql.Timestamp

/** Entity catalog for the engine.
  *
  * The first group mirrors the reference's record types (see SURVEY.md §1.3;
  * reference: `hotitem/entity/UserBehavior.java:11-18`,
  * `hotitem/entity/hotpage/ApacheLogEvent.java:11-18`,
  * `orderdetect/entity/OrderEvent.java:9-13`,
  * `orderdetect/entity/ReceiptEvent.java:9-12`). Timestamps are normalized to
  * `java.sql.Timestamp` (Spark `TimestampType`, UTC) at ingest — the reference
  * mixes epoch-sec and epoch-ms Longs; we never carry raw Longs past graft.io.
  */
final case class UserBehavior(
    userId: Long,
    itemId: Long,
    categoryId: Int,
    behavior: String,
    ts: Timestamp)

final case class ItemViewCount(itemId: Long, windowEnd: Long, cnt: Long)

final case class ApacheLogEvent(
    ip: String,
    userId: String,
    ts: Timestamp,
    method: String,
    url: String)

final case class PageViewCount(url: String, windowEnd: Long, cnt: Long)

final case class OrderEvent(
    orderId: Long,
    eventType: String, // "create" | "pay"
    txId: String,
    ts: Timestamp)

final case class OrderResult(orderId: Long, resultState: String)

final case class ReceiptEvent(txId: String, payChannel: String, ts: Timestamp)

/** Driver testdata `events` table row (TESTDATA.md / FIXTURES.md §2). */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String, // click|view|purchase|signup|error
    value: Double,
    props: String)

/** Driver testdata `documents` table row. */
final case class Document(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

/** Driver testdata `embeddings` table row. */
final case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)
