"""REST-shaped Elasticsearch consumer plan: render the exact HTTP call
sequence the reference consumer performs (utils.go:103-113 dispatch,
es.go:47-144 request bodies) as a DataFrame of (offset, method, path,
body) — verifiable without a live cluster, and executable by any bulk
HTTP runner.

Reference parity, per operation:
  INSERT  -> index document (es.go:88-110). The reference omits `_id`
             so replays duplicate (es.go:95-98); here the document id
             IS the key (`PUT /{index}/_doc/{key}`) — same write, made
             idempotent, matching the engine-wide keyed-merge fix.
  UPDATE  -> `POST /{index}/_update_by_query` with the Painless script
             `ctx._source.putAll(params.data)` and a `match` query on
             the payload's key (es.go:47-86) — byte-for-byte the same
             script source and body shape, preserving putAll's
             partial-merge semantics (absent key = unchanged, explicit
             null = set null).
  DELETE  -> `POST /{index}/_delete_by_query` with the same `match`
             (es.go:112-144).

Everything is JVM-side (`from_json` + `to_json` on nested structs) —
no Python in the per-event path; at scale this is a scan-shaped pass
whose output feeds a bulk executor, replacing the reference's one
blocking round-trip per event (its stated throughput bound, SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUTALL_SCRIPT = "ctx._source.putAll(params.data)"  # es.go:56


def es_consumer_requests(events: DataFrame, key: str = "id") -> DataFrame:
    """Envelope rows (offset, operationType, tableName, payload JSON)
    -> ordered REST requests (offset, method, path, body). Rows whose
    payload fails to parse or lacks the key are dropped, mirroring the
    consumer's skip-and-log (utils.go:99-102) — dead_letters() exposes
    them upstream."""
    p = F.from_json("payload", "map<string,string>")
    ev = (events
          .withColumn("_p", p)
          .filter(F.col("_p").isNotNull())
          .withColumn("_k", F.col("_p")[key])
          .filter(F.col("_k").isNotNull()))

    match_q = F.struct(
        F.struct(F.col("_k").alias(key)).alias("match")).alias("query")
    update_body = F.to_json(F.struct(
        F.struct(
            F.lit(PUTALL_SCRIPT).alias("source"),
            F.lit("painless").alias("lang"),
            F.struct(F.col("_p").alias("data")).alias("params"),
        ).alias("script"),
        match_q,
    ))
    delete_body = F.to_json(F.struct(match_q))
    insert_body = F.to_json(F.col("_p"))

    method = (F.when(F.col("operationType") == "INSERT", F.lit("PUT"))
               .otherwise(F.lit("POST")))
    path = (
        F.when(F.col("operationType") == "INSERT",
               F.concat(F.lit("/"), F.col("tableName"), F.lit("/_doc/"),
                        F.col("_k")))
         .when(F.col("operationType") == "UPDATE",
               F.concat(F.lit("/"), F.col("tableName"),
                        F.lit("/_update_by_query")))
         .otherwise(F.concat(F.lit("/"), F.col("tableName"),
                             F.lit("/_delete_by_query"))))
    body = (F.when(F.col("operationType") == "INSERT", insert_body)
             .when(F.col("operationType") == "UPDATE", update_body)
             .otherwise(delete_body))
    return (ev.filter(F.col("operationType")
                       .isin("INSERT", "UPDATE", "DELETE"))
              .select("offset", method.alias("method"), path.alias("path"),
                      body.alias("body")))


BULK_MAX_ACTIONS = 500


def es_bulk_requests(events: DataFrame, key: str = "id",
                     max_actions: int = BULK_MAX_ACTIONS) -> DataFrame:
    """Envelope rows -> Elasticsearch `_bulk` NDJSON request bodies —
    the amortized form of es_consumer_requests and THE fix for the
    reference's stated throughput bound (one blocking HTTP round-trip
    per event, es.go:100/77/135): N actions ride one request.

    Per action, byte-parity with the per-event plan is preserved:
      INSERT -> {"index": {"_index": t, "_id": k}} + the document
                (keyed, so replays stay idempotent — unlike es.go:95-98)
      UPDATE -> {"update": {"_index": t, "_id": k}} + {"script":
                {putAll painless, params.data}} — same script source as
                es.go:56, applied by doc id (the _update_by_query match
                on the key resolves to exactly this document)
      DELETE -> {"delete": {"_index": t, "_id": k}} (action line only)

    Chunking: row_number per (tableName) in offset order, `max_actions`
    actions per body — per-key ordering is preserved because chunk
    order follows offset order within the index. Scale shape: pure
    JVM expressions (from_json/to_json/concat) + one window in the
    same tableName partitioning the downstream executor group needs;
    output is |events|/max_actions request rows."""
    from pyspark.sql import Window

    p = F.from_json("payload", "map<string,string>")
    ev = (events
          .withColumn("_p", p)
          .filter(F.col("_p").isNotNull())
          .withColumn("_k", F.col("_p")[key])
          .filter(F.col("_k").isNotNull())
          .filter(F.col("operationType")
                   .isin("INSERT", "UPDATE", "DELETE")))

    meta = F.struct(F.col("tableName").alias("_index"),
                    F.col("_k").alias("_id"))
    action = (F.when(F.col("operationType") == "INSERT",
                     F.to_json(F.struct(meta.alias("index"))))
               .when(F.col("operationType") == "UPDATE",
                     F.to_json(F.struct(meta.alias("update"))))
               .otherwise(F.to_json(F.struct(meta.alias("delete")))))
    update_line = F.to_json(F.struct(F.struct(
        F.lit(PUTALL_SCRIPT).alias("source"),
        F.lit("painless").alias("lang"),
        F.struct(F.col("_p").alias("data")).alias("params"),
    ).alias("script")))
    doc_line = (F.when(F.col("operationType") == "INSERT",
                       F.to_json(F.col("_p")))
                 .when(F.col("operationType") == "UPDATE", update_line))
    lines = F.concat_ws("\n", action, doc_line)  # skips null doc_line

    w = Window.partitionBy("tableName").orderBy("offset")
    chunked = (ev.select("tableName", "offset", lines.alias("_l"))
                 .withColumn("_rn", F.row_number().over(w))
                 .withColumn("chunk_id",
                             F.expr(f"(_rn - 1) div {max_actions}")
                              .cast("long")))
    return (chunked.groupBy("tableName", "chunk_id")
                   .agg(F.count(F.lit(1)).alias("n_actions"),
                        F.min("offset").alias("first_offset"),
                        F.concat_ws(
                            "\n",
                            F.array_sort(F.collect_list(
                                F.struct("offset", "_l"))).getField("_l"))
                        .alias("body"))
                   .select("tableName", "chunk_id", "n_actions",
                           "first_offset",
                           F.concat(F.col("body"), F.lit("\n"))
                            .alias("body"),
                           F.lit("POST").alias("method"),
                           F.lit("/_bulk").alias("path")))


def execute_es_requests(requests: DataFrame, base_url: str,
                        timeout: float = 10.0) -> None:
    """EXECUTE a rendered REST plan against a live
    Elasticsearch-compatible endpoint — the runnable form of BOTH
    request frames above: per-event plans carry `offset`, bulk plans
    carry `first_offset`; either orders the posts. Stdlib-only (urllib)
    so it works wherever the
    executors run. Rows post per partition in offset order (repartition
    by the doc key upstream if strict per-key ordering across
    partitions is required — the same single-writer assumption as the
    reference's one-partition topic, utils.go:49). Non-2xx responses
    raise, failing the Spark task (at-least-once with the keyed
    idempotent request shapes above).

    In-sandbox the loopback round-trip test drives this against a fake
    recording server (tests/test_es_sink.py) — the closable slice of
    the live-wire gap: byte-exact bodies leaving over a real socket."""
    def run_partition(rows):
        import urllib.request

        def order_key(row):
            d = row.asDict()
            return d["offset"] if "offset" in d else d["first_offset"]

        for r in sorted(rows, key=order_key):
            req = urllib.request.Request(
                base_url.rstrip("/") + r["path"],
                data=r["body"].encode("utf-8"),
                method=r["method"],
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if resp.status >= 300:
                    raise RuntimeError(
                        f"ES request failed: {resp.status} {r['path']}")

    requests.foreachPartition(run_partition)


from postgres_es_cdc_spark.cdc.txn import TxnUpsertSink  # noqa: E402


class EsForwardingTxnSink(TxnUpsertSink):
    """The reference's ENTIRE observable contract as one glued stream:
    WAL segments -> WalStreamApply decode -> transaction-atomic upsert
    fold -> `_bulk` NDJSON rendered and EXECUTED against an
    Elasticsearch endpoint, per micro-batch (utils.go:103-113 dispatch
    + es.go:47-144 bodies, minus the one-blocking-RTT-per-event bound).

    Implementation: a TxnUpsertSink whose `_on_committed` hook renders
    `es_bulk_requests` over the batch's committed events and posts them
    via `execute_es_requests`. The hook runs after the state merges and
    before the pending-buffer commit, so a crash in between replays the
    batch — at-least-once, safe because every request shape is keyed
    and idempotent (index-by-id, putAll-by-id, delete-by-id).

    Only committed transactions ever reach ES — the torn-state window
    the reference leaves open (producer.go:163-164 discards the
    Begin/Commit brackets) does not exist here."""

    def __init__(self, base_dir, schemas, es_url, key="id",
                 order_col="offset", txn_col="txn_id",
                 max_actions=BULK_MAX_ACTIONS):
        super().__init__(base_dir, schemas, key=key,
                         order_col=order_col, txn_col=txn_col)
        self.es_url = es_url
        self.max_actions = max_actions

    def _on_committed(self, ready, batch_id):
        reqs = es_bulk_requests(ready, key=self.key,
                                max_actions=self.max_actions)
        execute_es_requests(reqs, self.es_url)
