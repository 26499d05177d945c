"""Streaming NEAR-duplicate dedup: banded-SimHash with in-state hamming
verification — the compact-state streaming form of the batch near-dup
family (``pipeline/dedup.py``), for pipelines that must reject
near-copies at ingest instead of in a nightly sweep.

Why SimHash and not MinHash here: streaming state must be O(1) per
document. A MinHash near-dup needs the shingle sets (or wide
signatures) in state to verify candidates; SimHash packs the document
into 64 bits, and hamming distance <= d IS the verification. The
pigeonhole banding makes the state lookup exact: split the 64-bit
fingerprint into B=4 bands of 16 bits — two fingerprints within
hamming distance d <= B-1 agree EXACTLY on at least one band — so
keying the state store by (band, band_bits) finds every candidate
within distance 3 while each bucket holds only full fingerprints to
verify against (no false negatives; band collisions that fail the
hamming check are filtered by the in-group verify).

Operator shape:

1. stateless fingerprint: ``simhash_stream`` adds the 64-bit SimHash
   per document (mapInPandas over the pinned pure-python oracle — the
   batch table uses the codegen SQL form, ``dedup.simhash_signatures``;
   both are pinned equal in pytest);
2. stateless band fan-out: 4 rows per doc keyed (band, band_bits);
3. ONE stateful operator (``applyInPandasWithState`` keyed by the band
   bucket, event-time timeout): each bucket keeps the full fingerprints
   + event times seen within the watermark horizon, marks each incoming
   row hit/miss by exact hamming verify, appends its fingerprint
   (chaining semantics: a dropped doc still extends its cluster, like
   transitive near-dup clustering), and purges entries older than the
   watermark — state is bounded by (horizon x ingest rate), idle
   buckets are evicted by the timeout;
4. per-document verdict BATCH-side inside foreachBatch: a document's 4
   band rows always land in the same micro-batch, so a plain groupBy
   resolves "dropped iff ANY band hit" without chaining a second
   stateful operator onto the query.

Determinism: within each bucket the rows of a micro-batch are processed
in (ts, doc_id) order, so same-batch near-dups resolve first-wins
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SIMHASH_BANDS = 4
BAND_BITS = 16
DEFAULT_MAX_HAMMING = SIMHASH_BANDS - 1  # pigeonhole-exact at B-1


def batch_simhash(texts) -> "list[int]":
    """Vectorized 64-bit SimHash for a batch of texts — exactly equal
    to ``dedup.simhash_oracle`` per row (pinned in pytest), but md5 is
    computed ONCE per unique word across the batch (web corpora share
    most vocabulary between documents) and the per-bit majority votes
    accumulate via one np.add.at over a (n_docs, 64) sign matrix
    instead of a per-doc per-bit python loop."""
    import hashlib

    import numpy as np

    vocab: dict = {}
    word_ids = []
    doc_len = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        words = set(text.split(" "))
        doc_len[i] = len(words)
        for w in words:
            word_ids.append(vocab.setdefault(w, len(vocab)))
    n, v = len(texts), len(vocab)
    if v == 0:
        return [0] * n
    hashes = np.empty(v, dtype=np.uint64)
    for w, wid in vocab.items():
        hashes[wid] = int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "big"
        )
    # (v, 64) sign contributions: +1 where the word hash bit is set
    bits = (
        (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
    ).astype(np.int64)
    signs = 2 * bits - 1
    # word_ids is doc-contiguous by construction -> segment sums via
    # cumsum difference (np.add.at scatter AND 2-D np.add.reduceat both
    # measured SLOWER than the per-doc python loop on shared-vocab
    # batches; the cumsum form is one vectorized pass + two gathers)
    ends = np.cumsum(doc_len)
    cs = np.vstack(
        (np.zeros((1, 64), dtype=np.int64),
         np.cumsum(signs[np.asarray(word_ids)], axis=0))
    )
    votes = cs[ends] - cs[ends - doc_len]
    sig = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return sig.view(np.int64).tolist()


def simhash_stream(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds a ``simhash`` column (64-bit, signed int64). Stateless
    (mapInPandas), so it composes into streaming queries; the batch
    table path uses the pure-SQL ``dedup.simhash_signatures`` instead,
    and both equal the pure-python ``dedup.simhash_oracle`` (pytest)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in documents.schema.fields
    ) + ", simhash long"

    def add_simhash(pdfs):
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf["simhash"] = batch_simhash(list(pdf[text_col]))
            yield pdf

    return documents.mapInPandas(add_simhash, schema=schema)


def _band_bits_col(band: int):
    """Unsigned 16-bit slice ``band`` of the signed 64-bit simhash."""
    return F.expr(
        f"CAST(shiftright(simhash, {band * BAND_BITS}) & 65535 AS BIGINT)"
    )


def neardup_dedup_stream(
    documents: DataFrame,
    sink,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_hamming: int = DEFAULT_MAX_HAMMING,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """documents: a *streaming* DataFrame with (doc_id, text, ts_col).
    sink: fn(survivors_df, batch_id) receiving the documents that are
    NOT near-duplicates of anything seen in the watermark horizon
    (columns: doc_id, ts, simhash). Returns the started query.

    A document is dropped iff some band bucket already holds a
    fingerprint within ``max_hamming``; at the default B-1 the banding
    is exactly the pigeonhole bound, so the drop set equals "hamming
    <= max_hamming to something seen in-horizon" with no approximation.

    Timezone safety: Arrow hands the state function tz-NAIVE pandas
    timestamps rendered in ``spark.sql.session.timeZone``, while
    ``getCurrentWatermarkMs`` is epoch ms — so the horizon comparison
    localizes each timestamp to the captured session timezone before
    taking ``.timestamp()`` (a naive ``.timestamp()`` silently assumes
    UTC and skews the purge horizon by the session's UTC offset).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    session_tz = (
        documents.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )

    sim = simhash_stream(documents).select(
        "doc_id", F.col(ts_col).alias("ts"), "simhash"
    )
    bands = sim.select(
        "doc_id",
        "ts",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_bits_col(b).alias("band_bits"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "ts", "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.band_bits").alias("band_bits"),
    )

    import pandas as pd

    horizon_ms = int(pd.Timedelta(watermark).total_seconds() * 1000)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        sims, tss = state.get if state.exists else ([], [])
        sims, tss = list(sims), list(tss)
        wm_ms = state.getCurrentWatermarkMs()
        # purge before lookup so an expired fingerprint can't match:
        # in-horizon is defined against the CURRENT watermark
        if wm_ms > 0 and tss:
            keep = [i for i, t in enumerate(tss) if t >= wm_ms]
            if len(keep) != len(tss):
                sims = [sims[i] for i in keep]
                tss = [tss[i] for i in keep]

        out_doc, out_ts, out_sim, out_hit = [], [], [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "doc_id"], kind="mergesort")
        for doc_id, ts, sim_v in zip(
            rows["doc_id"], rows["ts"], rows["simhash"]
        ):
            hit = any(
                bin((int(s) ^ int(sim_v)) & ((1 << 64) - 1)).count("1")
                <= max_hamming
                for s in sims
            )
            sims.append(int(sim_v))
            ts_aware = ts if ts.tzinfo else ts.tz_localize(session_tz)
            tss.append(int(ts_aware.timestamp() * 1000))
            out_doc.append(int(doc_id))
            out_ts.append(ts)
            out_sim.append(int(sim_v))
            out_hit.append(1 if hit else 0)

        state.update((sims, tss))
        # idle-bucket eviction: once the watermark passes the newest
        # entry plus the horizon, nothing in this bucket can match again
        state.setTimeoutTimestamp(max(tss) + horizon_ms)
        yield pd.DataFrame({
            "doc_id": out_doc, "ts": out_ts,
            "simhash": out_sim, "hit": out_hit,
        })

    flagged = (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "band_bits")
        .applyInPandasWithState(
            update,
            outputStructType="doc_id long, ts timestamp, simhash long, hit int",
            stateStructType="sims array<long>, tss array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

    def process_batch(df: DataFrame, batch_id: int) -> None:
        survivors = (
            df.groupBy("doc_id")
            .agg(
                F.max("hit").alias("any_hit"),
                F.min("ts").alias("ts"),
                F.min("simhash").alias("simhash"),
            )
            .where(F.col("any_hit") == 0)
            .select("doc_id", "ts", "simhash")
        )
        sink(survivors, batch_id)

    writer = flagged.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
