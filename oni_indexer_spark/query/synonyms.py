"""Query-time synonyms — Lucene ``SynonymQuery`` semantics on Spark.

Solr's SynonymGraphFilter at query time rewrites each term into a
SynonymQuery over its group, which scores the group AS ONE TERM
(Lucene SynonymQuery javadoc): term frequency = SUM of the members'
tfs in the doc, document frequency = MAX of the members' docFreqs —
tf merges BEFORE BM25's saturation, so this is NOT expressible as a
weighted OR over member terms (which would saturate each member
separately and over-score docs hitting several synonyms).

The scorer is a variant of the block-aligned multi-term pass
(``bm25._make_decode_score_group_arrow``): one shuffle of COMPRESSED
block rows co-locates every member term's postings per doc-range
block, then a numpy pass scatter-adds raw tf into a dense
(block-group x block_size x n_groups) grid, saturates per group, and
sums group scores per doc — exact totals, per-batch candidate
selection, nothing doc-sized leaves the worker. Shuffle volume is the
same few-bytes-per-posting blob shuffle as a plain multi-term query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_decode_synonym_group_arrow(
    block_size: int,
    grp_by_tid: dict[int, int],
    idf_by_grp: list[float],
    avgdl: float,
    k1: float,
    b: float,
    n_groups_and: int | None,
    k: int | None,
    positions: bool = False,
    allowed_bc=None,
):
    """Arrow scorer: rows are (tid, block_id, block_min_dl[, n], blob),
    hash-partitioned and sorted by block_id so all member terms'
    postings for a doc-range block arrive together. Per batch of
    complete blocks: decode -> scatter-add RAW tf per (doc-slot, group)
    -> saturate per group with that group's idf -> sum groups per doc.
    ``n_groups_and``: AND at the group level (doc must hit every
    group). ``k``: conservative per-batch candidate selection (same
    rounding-grid guard as the plain scorer)."""
    n_groups = len(idf_by_grp)

    def _decode(batches):
        import numpy as np
        import pyarrow as pa

        from oni_indexer_spark.index.codec import (
            decode_postings_flat,
            decode_postings_pos_flat,
        )
        from oni_indexer_spark.query.bm25 import _membership_filter

        idf_arr = np.asarray(idf_by_grp, dtype=np.float64)

        def process(tb):
            idx = {n: i for i, n in enumerate(tb.schema.names)}
            blobs = tb.column(idx["blob"]).to_pylist()
            if not blobs:
                return None
            tids = tb.column(idx["tid"]).to_numpy(zero_copy_only=False).astype(np.int64)
            blk = tb.column(idx["block_id"]).to_numpy(zero_copy_only=False).astype(np.int64)
            base_docs = blk * block_size
            base_dls = (
                tb.column(idx["block_min_dl"]).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            if positions:
                ns = tb.column(idx["n"]).to_numpy(zero_copy_only=False).astype(np.int64)
                doc_ids, tfs, dls, counts, _p = decode_postings_pos_flat(
                    blobs, ns, base_docs, base_dls, with_positions=False
                )
            else:
                doc_ids, tfs, dls, counts = decode_postings_flat(
                    blobs, base_docs, base_dls
                )
            grp_row = np.array([grp_by_tid[int(t)] for t in tids], dtype=np.int64)
            grp_post = np.repeat(grp_row, counts)
            # dense (block-group, in-block offset) slots, as in the
            # plain multi-term scorer
            new_grp = np.concatenate(([True], blk[1:] != blk[:-1]))
            grp_of_row = np.cumsum(new_grp) - 1
            n_blkgrp = int(grp_of_row[-1]) + 1
            grp_base = base_docs[new_grp]
            grp_rep = np.repeat(grp_of_row, counts)
            slot = grp_rep * block_size + (doc_ids - grp_base[grp_rep])
            # raw tf accumulates per (slot, synonym group) BEFORE
            # saturation — the defining SynonymQuery semantic
            tfsum = np.zeros(n_blkgrp * block_size * n_groups, dtype=np.float64)
            np.add.at(tfsum, slot * n_groups + grp_post, tfs.astype(np.float64))
            dl_arr = np.zeros(n_blkgrp * block_size, dtype=np.float64)
            dl_arr[slot] = dls.astype(np.float64)  # dl identical per doc
            tf2 = tfsum.reshape(-1, n_groups)
            denom = tf2 + k1 * (1.0 - b + b * (dl_arr / avgdl))[:, None]
            with np.errstate(invalid="ignore", divide="ignore"):
                sat = np.where(tf2 > 0.0, tf2 * (k1 + 1.0) / denom, 0.0)
            tot = sat @ idf_arr
            hits = (tf2 > 0.0).sum(axis=1)
            mask = (
                (hits == n_groups_and) if n_groups_and is not None else (hits > 0)
            )
            sel = np.nonzero(mask)[0]
            out_docs = grp_base[sel // block_size] + (sel % block_size)
            out_s = tot[sel]
            if allowed_bc is not None:
                out_docs, out_s = _membership_filter(
                    allowed_bc.value, out_docs, out_s
                )
            if k is not None and out_s.size > k:
                kth = np.partition(out_s, out_s.size - k)[out_s.size - k]
                keep = out_s >= (np.round(kth, 6) - 1e-6)
                out_docs, out_s = out_docs[keep], out_s[keep]
            if out_s.size == 0:
                return None
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(out_docs, type=pa.int64()),
                    pa.array(out_s, type=pa.float64()),
                ],
                names=["doc_id", "score"],
            )

        carry = None
        for bt in batches:
            if carry is not None:
                bt = pa.Table.from_batches([carry, bt]).combine_chunks().to_batches()[0]
                carry = None
            n = len(bt)
            if n == 0:
                continue
            idx = {nm: i for i, nm in enumerate(bt.schema.names)}
            blk = bt.column(idx["block_id"]).to_numpy(zero_copy_only=False)
            last_start = int(np.searchsorted(blk, blk[n - 1], side="left"))
            carry = bt.slice(last_start)
            if last_start > 0:
                out = process(bt.slice(0, last_start))
                if out is not None:
                    yield out
        if carry is not None and len(carry) > 0:
            out = process(carry)
            if out is not None:
                yield out

    return _decode


def synonym_topk(
    tables,
    groups: list,
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Top-k for a query of synonym groups. ``groups`` is a list whose
    elements are either a plain term (singleton group) or a list of
    synonymous terms. Each group scores as one Lucene SynonymQuery
    (tf summed across members, df = max member df); groups combine as
    OR (score sum) or AND (every group must hit)."""
    from oni_indexer_spark.analyzer import analyzer_tokenize_py
    from oni_indexer_spark.hashing import xxhash64_str
    from oni_indexer_spark.query.bm25 import (
        _buckets_for,
        _empty_result,
        _ranked,
        searcher_for,
    )

    s = searcher_for(tables)
    s._check_external_staleness()
    cfg = tables.cfg
    if not cfg.compress:
        raise ValueError("synonym_topk needs the compressed (blob) index layout")

    norm_groups: list[list[str]] = []
    seen: set[str] = set()
    for g in groups:
        members = [g] if isinstance(g, str) else list(g)
        toks: list[str] = []
        for m in members:
            ts = analyzer_tokenize_py(m, cfg.analyzer)
            if len(ts) > 1:
                raise ValueError(f"synonym member analyzes to {len(ts)} tokens: {m!r}")
            if ts and ts[0] not in toks:
                toks.append(ts[0])
        for t in toks:
            if t in seen:
                raise ValueError(f"term {t!r} appears in two synonym groups")
            seen.add(t)
        if toks:
            norm_groups.append(toks)
    if not norm_groups:
        return _empty_result(tables)

    all_terms = [t for g in norm_groups for t in g]
    dfs = s.term_dfs(all_terms)
    present_groups: list[tuple[list[str], int]] = []
    for g in norm_groups:
        present = [t for t in g if t in dfs]
        if not present:
            if mode == "and":
                return _empty_result(tables)
            continue
        present_groups.append((present, max(dfs[t] for t in present)))
    if not present_groups:
        return _empty_result(tables)

    n_docs, avgdl = s.stats()
    grp_by_tid: dict[int, int] = {}
    idf_by_grp: list[float] = []
    scan_terms: list[str] = []
    for gi, (members, df_g) in enumerate(present_groups):
        idf_by_grp.append(math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5)))
        for t in members:
            grp_by_tid[xxhash64_str(t)] = gi
            scan_terms.append(t)

    tids = [xxhash64_str(t) for t in scan_terms]
    pos_cols = ["n"] if cfg.positions else []
    syn_buckets = _buckets_for(tables, scan_terms)
    p = tables.postings.where(
        F.col("bucket").isin(syn_buckets) & F.col("tid").isin(tids)
    ).select("tid", "block_id", "block_min_dl", *pos_cols, "blob")
    # scale-adaptive fan-out / shuffle-free crossover, same rule as
    # bm25._scores (Σ df over the scanned terms bounds the decoded volume)
    from oni_indexer_spark.query.bm25 import _colocate_blocks

    co = _colocate_blocks(
        p,
        sum(dfs[t] for t in scan_terms),
        int(n_docs * avgdl * len(syn_buckets) / cfg.n_buckets),
    )
    scored = co.mapInArrow(
        _make_decode_synonym_group_arrow(
            cfg.block_size,
            grp_by_tid,
            idf_by_grp,
            float(avgdl),
            cfg.k1,
            cfg.b,
            len(norm_groups) if mode == "and" else None,
            k,
            positions=cfg.positions,
        ),
        "doc_id long, score double",
    )
    return _ranked(scored, k)
