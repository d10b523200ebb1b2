"""pgoutput logical-replication message codec — the reference producer's
decode layer (producer.go:110-195), Spark-shaped.

Message formats are the PUBLIC Postgres protocol
(doc: "Logical Replication Message Formats", protocol version 1, text
tuple encoding — exactly what the reference consumes via pglogrepl):

  'R' Relation  oid:int32 ns:cstr name:cstr replident:byte ncols:int16
                [flags:byte name:cstr typoid:int32 typmod:int32]*
  'B' Begin     final_lsn:int64 commit_ts:int64 xid:int32
  'C' Commit    flags:byte commit_lsn:int64 end_lsn:int64 ts:int64
  'I' Insert    oid:int32 'N' TupleData
  'U' Update    oid:int32 ['K'|'O' TupleData] 'N' TupleData
  'D' Delete    oid:int32 'K'|'O' TupleData
  'T' Truncate  nrels:int32 options:byte [oid:int32]*
  TupleData     ncols:int16 then per column:
                'n' (SQL null) | 'u' (unchanged TOAST) |
                't' len:int32 utf8-bytes

Distributed decode is TWO passes, because a partition of the WAL need
not contain the Relation message its data messages reference (the
reference can cache relations inline only because it reads one
sequential stream, producer.go:68,121-122):

  pass 1 — filter to 'R' messages (first byte), decode driver-side.
           Relation messages are vocabulary-sized (one per table per
           connection), so this collect is O(tables), like
           apply.observed_payload_columns.
  pass 2 — broadcast the relation cache; Arrow-batched mapInPandas
           parses every data message into the engine's envelope
           (operationType/tableName/payload JSON + txn markers).

Semantics parity with the reference's column decode (producer.go:183-195):
  'n' -> explicit JSON null ("set null"), 'u' (unchanged TOAST) ->
  key ABSENT from the payload ("unchanged") — landing exactly on the
  presence-map distinction apply_changes folds with; 't' values stay
  text, cast later by the declared table schema (producer.go:176-181's
  text decode; unknown types stay raw strings like its OID fallback).

Transaction ids: protocol v1 carries the xid only on Begin, so
assigning txns to data rows is inherently sequential in WAL order —
``assign_txn_ids`` does it with a running last-Begin window (the same
single-stream assumption the reference lives on; protocol v2's
streaming mode adds per-message xids precisely so this can parallelize,
and decode_messages passes such an xid through when present).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Sentinel for "unchanged TOAST" values. A NUL-prefixed string, not an
# object(): sentinel identity does not survive cloudpickle into UDF
# workers (the closure gets a by-value copy and `is` checks fail there),
# while string equality does — and a NUL byte cannot appear in Postgres
# text values, so no real value can collide.
UNCHANGED = "\x00__pg_unchanged__"

# ---------------------------------------------------------------------------
# Encoders (test/generator side — byte-exact protocol v1 writers)
# ---------------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def encode_relation(oid: int, name: str, cols: list[str],
                    namespace: str = "public") -> bytes:
    out = [b"R", struct.pack(">I", oid), _cstr(namespace), _cstr(name),
           b"d", struct.pack(">H", len(cols))]
    for c in cols:
        # flags=0, type oid 25 (text — the wire is text-encoded anyway),
        # typmod -1
        out.append(b"\x00" + _cstr(c) + struct.pack(">Ii", 25, -1))
    return b"".join(out)


def encode_begin(xid: int, lsn: int = 0, ts: int = 0) -> bytes:
    return b"B" + struct.pack(">QQI", lsn, ts, xid)


def encode_commit(lsn: int = 0, ts: int = 0) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, lsn, lsn, ts)


def _tuple_data(values: list) -> bytes:
    out = [struct.pack(">H", len(values))]
    for v in values:
        if v is None:
            out.append(b"n")
        elif v == UNCHANGED:
            out.append(b"u")
        else:
            b = str(v).encode()
            out.append(b"t" + struct.pack(">I", len(b)) + b)
    return b"".join(out)


def encode_insert(oid: int, values: list) -> bytes:
    return b"I" + struct.pack(">I", oid) + b"N" + _tuple_data(values)


def encode_update(oid: int, new_values: list,
                  key_values: list | None = None) -> bytes:
    old = (b"K" + _tuple_data(key_values)) if key_values is not None else b""
    return b"U" + struct.pack(">I", oid) + old + b"N" + _tuple_data(new_values)


def encode_delete(oid: int, key_values: list) -> bytes:
    return b"D" + struct.pack(">I", oid) + b"K" + _tuple_data(key_values)


def encode_truncate(oids: list[int]) -> bytes:
    return (b"T" + struct.pack(">IB", len(oids), 0)
            + b"".join(struct.pack(">I", o) for o in oids))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _parse_tuple(data: bytes, pos: int) -> tuple[list, int]:
    """TupleData -> list of str | None | UNCHANGED, new position."""
    (ncols,) = struct.unpack_from(">H", data, pos)
    pos += 2
    vals: list = []
    for _ in range(ncols):
        kind = data[pos:pos + 1]
        pos += 1
        if kind == b"n":
            vals.append(None)
        elif kind == b"u":
            vals.append(UNCHANGED)
        elif kind == b"t":
            (ln,) = struct.unpack_from(">I", data, pos)
            pos += 4
            vals.append(data[pos:pos + ln].decode())
            pos += ln
        else:  # 'b' binary — not produced in text mode
            (ln,) = struct.unpack_from(">I", data, pos)
            pos += 4 + ln
            vals.append(None)
    return vals, pos


def decode_relation(data: bytes) -> tuple[int, str, list[str]]:
    """'R' message -> (oid, table name, column names)."""
    (oid,) = struct.unpack_from(">I", data, 1)
    pos = 5
    end = data.index(b"\x00", pos)          # namespace (unused in envelope)
    pos = end + 1
    end = data.index(b"\x00", pos)
    name = data[pos:end].decode()
    pos = end + 1 + 1                        # replica identity byte
    (ncols,) = struct.unpack_from(">H", data, pos)
    pos += 2
    cols: list[str] = []
    for _ in range(ncols):
        pos += 1                             # flags
        end = data.index(b"\x00", pos)
        cols.append(data[pos:end].decode())
        pos = end + 1 + 8                    # type oid + typmod
    return oid, name, cols


def relation_cache(messages: DataFrame, data_col: str = "data") -> dict:
    """Pass 1: decode every Relation message driver-side.

    The filter runs distributed (first-byte predicate on the binary
    column); only the vocabulary-sized 'R' subset is collected."""
    rels = (messages
            .filter(F.expr(f"substring({data_col}, 1, 1) = X'52'"))  # 'R'
            .select(data_col).collect())
    cache: dict[int, tuple[str, list[str]]] = {}
    for row in rels:
        oid, name, cols = decode_relation(bytes(row[0]))
        cache[oid] = (name, cols)
    return cache


def _payload_json(cols: list[str], vals: list) -> str:
    # 'u' (unchanged TOAST) keys stay ABSENT; explicit nulls stay null —
    # the presence-map contract of apply_changes.
    return json.dumps({c: v for c, v in zip(cols, vals) if not (isinstance(v, str) and v == UNCHANGED)},
                      separators=(",", ":"))


def decode_messages(messages: DataFrame, relcache: dict,
                    data_col: str = "data",
                    offset_col: str = "offset") -> DataFrame:
    """Pass 2: binary pgoutput messages -> envelope rows
    (offset, operationType, tableName, payload, txn_id).

    Arrow-batched mapInPandas: format parsing is per-row byte fiddling
    no built-in expression covers; the relation cache rides the closure
    (broadcast by task serialization — it is O(tables) small). Data
    rows carry txn_id null under protocol v1 (use assign_txn_ids);
    Begin markers carry their xid.
    """
    schema = ("offset long, operationType string, tableName string, "
              "payload string, txn_id long")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Hot loop (guide §4.2: the per-task work IS this function —
        # once the plan shape is one pipelined Arrow pass, the decode
        # cost is pure Python per-row work). Local-bound unpackers,
        # int tag compares (no per-row 1-byte slices), direct appends
        # instead of a closure, and the TupleData walk inlined straight
        # into the payload dict (skipping discarded old-tuples without
        # materializing their values). Byte semantics are identical to
        # _parse_tuple/_payload_json (golden-wire tests pin them).
        u32 = struct.Struct(">I").unpack_from
        u16 = struct.Struct(">H").unpack_from
        dumps = json.dumps
        sep = (",", ":")
        for pdf in batches:
            offs_in = pdf["offset"].tolist()
            raws = pdf[data_col].tolist()
            offs: list = []
            ops: list = []
            tbls: list = []
            pays: list = []
            txns: list = []
            ap_off, ap_op, ap_tbl = offs.append, ops.append, tbls.append
            ap_pay, ap_txn = pays.append, txns.append
            # the select below aliases offset_col to "offset" before
            # mapInPandas, so the batch always carries these two names
            for off, raw in zip(offs_in, raws):
                data = bytes(raw)
                tag = data[0]
                if tag == 73 or tag == 85 or tag == 68:   # I / U / D
                    (oid,) = u32(data, 1)
                    name, cols = relcache[oid]
                    pos = 5
                    if tag == 85:
                        k = data[5]
                        if k == 75 or k == 79:            # 'K'/'O': skip
                            (ncols,) = u16(data, 6)
                            pos = 8
                            for _ in range(ncols):
                                kind = data[pos]
                                pos += 1
                                if kind != 110 and kind != 117:  # not n/u
                                    (ln,) = u32(data, pos)
                                    pos += 4 + ln
                        pos += 1                          # 'N'
                        op = "UPDATE"
                    elif tag == 73:
                        pos += 1                          # 'N'
                        op = "INSERT"
                    else:
                        pos += 1                          # 'K'/'O'
                        op = "DELETE"
                    (ncols,) = u16(data, pos)
                    pos += 2
                    ncl = len(cols)
                    d: dict = {}
                    for ci in range(ncols):
                        kind = data[pos]
                        pos += 1
                        if kind == 116:                   # 't' text
                            (ln,) = u32(data, pos)
                            pos += 4
                            if ci < ncl:                  # zip truncation
                                d[cols[ci]] = data[pos:pos + ln].decode()
                            pos += ln
                        elif kind == 110:                 # 'n' SQL null
                            if ci < ncl:
                                d[cols[ci]] = None
                        elif kind == 117:                 # 'u': key ABSENT
                            pass
                        else:                             # 'b' binary
                            (ln,) = u32(data, pos)
                            pos += 4 + ln
                            if ci < ncl:
                                d[cols[ci]] = None
                    ap_off(off)
                    ap_op(op)
                    ap_tbl(name)
                    ap_pay(dumps(d, separators=sep))
                    ap_txn(None)
                elif tag == 66:                           # 'B'
                    (xid,) = u32(data, 17)
                    ap_off(off)
                    ap_op("BEGIN")
                    ap_tbl(None)
                    ap_pay(None)
                    ap_txn(xid)
                elif tag == 67:                           # 'C'
                    ap_off(off)
                    ap_op("COMMIT")
                    ap_tbl(None)
                    ap_pay(None)
                    ap_txn(None)
                elif tag == 84:                           # 'T'
                    (nrels,) = u32(data, 1)
                    for i in range(nrels):
                        (oid,) = u32(data, 6 + 4 * i)
                        ap_off(off)
                        ap_op("TRUNCATE")
                        ap_tbl(relcache[oid][0])
                        ap_pay(None)
                        ap_txn(None)
                # 'R' and unknown tags produce no envelope rows
            yield pd.DataFrame({"offset": offs, "operationType": ops,
                                "tableName": tbls, "payload": pays,
                                "txn_id": txns})

    return messages.select(F.col(offset_col).alias("offset"), data_col) \
                   .mapInPandas(parse, schema)


def assign_txn_ids(events: DataFrame,
                   order_col: str = "offset") -> DataFrame:
    """Propagate each Begin's xid to every following row up to the next
    Begin (WAL order). Protocol v1 ties this to the global stream order,
    so the window is intentionally unpartitioned — the same sequential
    constraint the reference's consumer lives under (utils.go:49 single
    partition); with v2 per-message xids decode_messages already fills
    txn_id and this pass is skipped."""
    w = (Window.orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn(
        "txn_id", F.last("txn_id", ignorenulls=True).over(w))


def decode_wal_stream(messages: DataFrame, data_col: str = "data",
                      offset_col: str = "offset") -> DataFrame:
    """Full frontend: relation pass + decode pass + txn assignment.
    The result feeds cdc.txn.committed_events / apply_changes directly —
    i.e. producer.go:110-195 and its Begin/Commit drop (producer.go:
    163-164) replaced by a decode that KEEPS transaction atomicity."""
    cache = relation_cache(messages, data_col)
    return assign_txn_ids(
        decode_messages(messages, cache, data_col, offset_col))


# ---------------------------------------------------------------------------
# Envelope -> wire -> envelope round-trip (the oracle-checked query path)
# ---------------------------------------------------------------------------


def encode_typed_events(events: DataFrame, oid: int,
                        value_schema) -> DataFrame:
    """Typed envelope events (payload struct + payload_fields presence
    array, the apply_changes_typed feed) -> binary pgoutput messages.

    The distributed half of the round-trip: one Arrow batch pass, each
    event serialized by the byte-exact protocol writers above. Columns
    absent from payload_fields encode as 'u' (unchanged TOAST) and
    explicit nulls as 'n' — preserving the presence distinction across
    the wire. Values format by DECLARED column type, not Python type:
    Arrow hands nullable integer struct fields to pandas as float64, so
    an untyped str() would wire "85.0" for a bigint."""
    schema = "offset long, data binary"
    # (name, kind) where kind picks the text formatter
    field_kinds = [(f.name, f.dataType.simpleString())
                   for f in value_schema.fields]

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Hot loop (guide §4.2): tuple-data byte assembly inlined with
        # local-bound packers and direct list iteration — the wire
        # bytes are identical to encode_insert/update/delete over the
        # same values (pinned by the golden-wire tests and the
        # roundtrip oracle hash).
        p_u32 = struct.Struct(">I").pack
        p_u16 = struct.Struct(">H").pack
        head = {"INSERT": b"I" + p_u32(oid) + b"N",
                "UPDATE": b"U" + p_u32(oid) + b"N",
                "DELETE": b"D" + p_u32(oid) + b"K"}
        nfields = p_u16(len(field_kinds))
        int_kinds = frozenset(("bigint", "int", "smallint", "tinyint"))
        for pdf in batches:
            offs = pdf["offset"].tolist()
            blobs = []
            ap = blobs.append
            for op, pay, fields in zip(pdf["operationType"].tolist(),
                                       pdf["payload"].tolist(),
                                       pdf["payload_fields"].tolist()):
                present = set(fields)
                parts = [head[op], nfields]
                app = parts.append
                for c, kind in field_kinds:
                    if c not in present:
                        app(b"u")
                        continue
                    v = pay[c]
                    if v is None or (isinstance(v, float) and v != v):
                        app(b"n")
                        continue
                    if kind in int_kinds:
                        # Arrow hands nullable integer struct fields to
                        # pandas as float64, lossy above 2^53 — a silent
                        # str(int(v)) would corrupt keys on the wire.
                        if isinstance(v, float) and (v != int(v)
                                                     or abs(v) >= 2 ** 53):
                            raise ValueError(
                                f"integer value {v!r} not exactly "
                                "representable after Arrow float64 "
                                "conversion; pass ids as strings or "
                                "re-chunk the batch to avoid nulls in "
                                "this column")
                        b = str(int(v)).encode()
                    elif kind == "double" or kind == "float":
                        b = repr(float(v)).encode()  # shortest repr
                    else:
                        b = str(v).encode()
                    app(b"t")
                    app(p_u32(len(b)))
                    app(b)
                ap(b"".join(parts))
            yield pd.DataFrame({"offset": offs, "data": blobs})

    return events.select("offset", "operationType", "payload",
                         "payload_fields").mapInPandas(enc, schema)


def cdc_pgoutput_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the synthesized typed event stream serialized to
    byte-exact pgoutput wire messages (plus a Relation message), decoded
    back through the two-pass frontend, and folded to final state. The
    oracle is the independent expected-state projection — so a single
    flipped bit anywhere in writer, parser, TOAST/null handling, or
    relation routing breaks the hash."""
    from postgres_es_cdc_spark.cdc.apply import apply_changes
    from postgres_es_cdc_spark.cdc.generate import (
        orders_cdc_events_typed, orders_cdc_value_schema)

    schema = orders_cdc_value_schema()
    cols = [f.name for f in schema.fields]
    oid = 16384
    wire = encode_typed_events(orders_cdc_events_typed(spark, sf_dir),
                               oid, schema)
    rel = spark.createDataFrame(
        [(-1, bytearray(encode_relation(oid, "orders", cols)))],
        "offset long, data binary")
    cache = relation_cache(rel)
    decoded = decode_messages(wire, cache)
    return apply_changes(decoded, schema)


def cdc_schema_evolution_fold(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Mid-stream SCHEMA EVOLUTION through the wire codec — the DDL
    case the reference mishandles by construction (producer.go:110-124
    caches each Relation as it arrives but replays from a fixed
    position, so a column added mid-stream desynchronizes older rows):
    a v1 Relation declares (id, custkey, status) and every order
    INSERTs under it; a v2 Relation re-send for the SAME oid ADDS
    'priority'; post-evolution UPDATEs set priority for id % 3 == 0.

    decode_with_relation_resends splits the batch at each Relation
    offset, so pre-evolution rows decode with 3-column tuples and
    post-evolution rows with 4 — WAL-reader semantics. Folding with the
    EVOLVED schema surfaces the added column as NULL for never-updated
    rows: exactly the putAll key-absent contract (es.go:47-86) applied
    to DDL drift, with no backfill rewrite of old events.

    Scale shape: the relation pass collects only the 2 'R' rows; decode
    is the same Arrow-batched span scan as the streaming path; the fold
    is one partial-aggregable per-key reduction."""
    from pyspark.sql.types import _parse_datatype_string

    from postgres_es_cdc_spark.cdc.apply import apply_changes
    from postgres_es_cdc_spark.catalog import table

    oid = 16400
    v1_schema = _parse_datatype_string(
        "id long, custkey long, status string")
    v2_schema = _parse_datatype_string(
        "id long, custkey long, status string, priority string")
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v1_ev = o.select(
        (k * 10).cast("long").alias("offset"),
        F.lit("INSERT").alias("operationType"),
        F.struct(k.cast("long").alias("id"),
                 F.col("o_custkey").cast("long").alias("custkey"),
                 F.col("o_orderstatus").alias("status")).alias("payload"),
        F.array(F.lit("id"), F.lit("custkey"),
                F.lit("status")).alias("payload_fields"))
    evo_off = 10 ** 10
    v2_ev = o.filter(k % 3 == 0).select(
        (F.lit(evo_off) + k * 10).cast("long").alias("offset"),
        F.lit("UPDATE").alias("operationType"),
        F.struct(k.cast("long").alias("id"),
                 F.lit(None).cast("long").alias("custkey"),
                 F.lit(None).cast("string").alias("status"),
                 F.concat(F.lit("P-"), F.col("o_orderpriority"))
                  .alias("priority")).alias("payload"),
        F.array(F.lit("id"), F.lit("priority")).alias("payload_fields"))

    def rel(off: int, cols: list) -> DataFrame:
        return spark.createDataFrame(
            [(off, bytearray(encode_relation(oid, "orders_evo", cols)))],
            "offset long, data binary")

    # Checkpointed: the span decode reads the wire frame once per span
    # (plus the relation collect), and each read would re-run BOTH
    # encode mapInPandas passes — materialize the bytes once, as the
    # streaming path's segment files do.
    wire = (rel(-2, ["id", "custkey", "status"])
            .unionByName(encode_typed_events(v1_ev, oid, v1_schema))
            .unionByName(rel(evo_off - 5,
                             ["id", "custkey", "status", "priority"]))
            .unionByName(encode_typed_events(v2_ev, oid, v2_schema))
            .localCheckpoint(eager=False))
    decoded, _ = decode_with_relation_resends(wire, {})
    return apply_changes(decoded, v2_schema)


# ---------------------------------------------------------------------------
# Streaming frontend: WAL segments -> decode -> transaction-atomic sink
# ---------------------------------------------------------------------------


def decode_with_relation_resends(batch: DataFrame,
                                 relcache: dict) -> tuple:
    """Decode honoring WAL order across Relation (re-)sends: data rows
    preceding a mid-batch Relation message decode against the PRIOR
    schema version, exactly as a sequential reader (producer.go caches
    as it reads) would. The batch is split at each Relation offset and
    each span decodes with the cache as of that point; Relation
    messages are vocabulary-count rare, so this is 1 span in the steady
    state. Returns (events, updated_cache). Shared by WalStreamApply's
    per-micro-batch path and cdc_schema_evolution_fold."""
    rel_rows = sorted(
        ((r[0], bytes(r[1])) for r in
         batch.filter(F.expr("substring(data, 1, 1) = X'52'"))
              .select("offset", "data").collect()),
        key=lambda t: t[0])
    if not rel_rows:
        return decode_messages(batch, dict(relcache)), dict(relcache)
    cache = dict(relcache)
    spans: list[DataFrame] = []
    lo: int | None = None
    for off, data in rel_rows:
        cond = (F.col("offset") < off) if lo is None else (
            (F.col("offset") > lo) & (F.col("offset") < off))
        spans.append(decode_messages(batch.filter(cond), dict(cache)))
        oid, name, cols = decode_relation(data)
        cache[oid] = (name, cols)
        lo = off
    spans.append(
        decode_messages(batch.filter(F.col("offset") > lo), dict(cache)))
    ev = spans[0]
    for s in spans[1:]:
        ev = ev.unionByName(s)
    return ev, cache


class WalStreamApply:
    """foreachBatch glue composing the codec with the transactional sink:
    per micro-batch decode + txn assignment, with the two pieces of
    cross-batch context a segmented WAL needs carried driver-side:

      * the relation cache (a table's Relation message may precede its
        rows by many segments) — updated from each batch's 'R' subset;
      * the open transaction's xid (a txn can span segment boundaries;
        protocol v1 rows before the batch's first Begin belong to it) —
        rows left null by the in-batch assignment coalesce to it, so
        they are NOT mistaken for autocommit writes.

    Both are tiny (O(tables) + one int) and are PERSISTED beside the
    sink's pending buffer after every batch, so a checkpoint restart
    resumes mid-transaction decode correctly without replaying the
    consumed segments."""

    CONTEXT = "_wal_context.json"

    def __init__(self, sink):
        self.sink = sink
        self.relcache: dict = {}
        self.last_xid: int | None = None
        self._load_context()

    def _context_path(self) -> str:
        return os.path.join(self.sink.base_dir, self.CONTEXT)

    def _load_context(self) -> None:
        path = self._context_path()
        if os.path.exists(path):
            with open(path) as f:
                ctx = json.load(f)
            self.relcache = {int(k): tuple(v)
                             for k, v in ctx["relcache"].items()}
            self.last_xid = ctx["last_xid"]

    def _save_context(self) -> None:
        os.makedirs(self.sink.base_dir, exist_ok=True)
        tmp = self._context_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"relcache": {str(k): list(v)
                                    for k, v in self.relcache.items()},
                       "last_xid": self.last_xid}, f)
        os.replace(tmp, self._context_path())

    def apply(self, batch: DataFrame, batch_id: int) -> None:
        ev = assign_txn_ids(self._decode_in_offset_order(batch))
        if self.last_xid is not None:
            ev = ev.withColumn(
                "txn_id", F.coalesce("txn_id", F.lit(self.last_xid)))
        # tableName null on markers: keep them for the sink's commit scan
        last_marker = (ev.filter(F.col("operationType")
                                  .isin("BEGIN", "COMMIT"))
                         .orderBy(F.col("offset").desc())
                         .select("operationType", "txn_id").limit(1)
                         .collect())
        self.sink.apply_batch(ev, batch_id)
        if last_marker:
            if last_marker[0][0] == "BEGIN":
                self.last_xid = int(last_marker[0][1])
            else:
                # the last transaction committed inside this batch — a
                # malformed data row arriving outside a Begin/Commit
                # bracket in a later batch must NOT be attributed to it
                # (it would park in the pending buffer forever); with no
                # open xid such rows keep txn_id null and surface.
                self.last_xid = None
        self._save_context()

    def _decode_in_offset_order(self, batch: DataFrame) -> DataFrame:
        ev, cache = decode_with_relation_resends(batch,
                                                 dict(self.relcache))
        self.relcache = cache
        return ev

    def writer(self):
        return self.apply


def wal_cdc_pipeline(wal_stream: DataFrame, sink, checkpoint_dir: str,
                     trigger_once: bool = True):
    """Wire a streaming DataFrame of (offset, data binary) WAL messages
    into a TxnUpsertSink: the reference's whole producer+consumer loop
    (producer.go:70-174 + utils.go:92-117) as one checkpointed stream —
    with the transaction atomicity it drops."""
    apply = WalStreamApply(sink)
    writer = (wal_stream.writeStream
              .foreachBatch(apply.writer())
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
