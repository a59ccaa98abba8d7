"""Candidate-pair generation inside LSH buckets + exact verification.

Replaces the reference's radius query (``VPTree.Within``,
/root/reference/vptree/vptree.go:100-124): within each band bucket all pairs
are generated (``id_a < id_b`` excludes self-pairs the way ``Within`` skips
the target by ID, vptree.go:113), then every candidate is verified against
the EXACT metric threshold — Hamming (simhash) or estimated Jaccard
(minhash), optionally confirmed with Jaro-Winkler — mirroring
``HashType.Threshold`` semantics (/root/reference/hash/hash.go:29-39).

Skew (SURVEY.md §7.4): a bucket larger than ``max_bucket_size`` — web
boilerplate collapsing thousands of pages into one band — is SALTED: its
sorted member list is split into consecutive chunks of at most
``max_bucket_size`` and pairs are only generated within a chunk. Cross-chunk
pairs are sacrificed (true dups still meet in their other B-1 bands); every
truncation is logged with the bucket size.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

from dedupe_ray.config import MinHashConfig, NearDupConfig, SimHashConfig
from dedupe_ray.functions.metrics import hamming64, jaro_winkler
from dedupe_ray.stages.groupapply import sorted_group_apply

logger = logging.getLogger(__name__)

__all__ = ["candidate_edges", "dedupe_edges", "verify_edges", "verify_edges_join"]

_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu(m: int) -> tuple[np.ndarray, np.ndarray]:
    got = _TRIU_CACHE.get(m)
    if got is None:
        got = np.triu_indices(m, k=1)
        _TRIU_CACHE[m] = got
    return got


def _emit_pairs_block(block: pa.Table, max_bucket_size: int) -> pa.Table:
    """Vectorized multi-group pair emission over one sorted block."""
    keys = block.column("band_key").to_numpy(zero_copy_only=False)
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    multi = counts >= 2
    for s, c in zip(starts[multi], counts[multi]):
        members = np.unique(ids[s : s + c])
        m = len(members)
        if m < 2:
            continue
        if m > max_bucket_size:
            logger.warning(
                "salting hot LSH bucket: size=%d > cap=%d (%d cross-salt pairs dropped)",
                m, max_bucket_size,
                (m * (m - 1) - (m // max_bucket_size) * max_bucket_size * (max_bucket_size - 1)) // 2,
            )
            for off in range(0, m, max_bucket_size):
                chunk = members[off : off + max_bucket_size]
                if len(chunk) >= 2:
                    iu, ju = _triu(len(chunk))
                    srcs.append(chunk[iu])
                    dsts.append(chunk[ju])
        else:
            iu, ju = _triu(m)
            srcs.append(members[iu])
            dsts.append(members[ju])
    if not srcs:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    # within-block dedupe (the same pair often fires in several bands that
    # landed in this block) — cheap pre-shrink before the global dedupe
    pairs = np.stack([src, dst], axis=1)
    pairs = np.unique(pairs, axis=0)
    return pa.table(
        {"src": pa.array(pairs[:, 0], pa.int64()), "dst": pa.array(pairs[:, 1], pa.int64())}
    )


def candidate_edges(banded: "ray.data.Dataset", max_bucket_size: int = 256) -> "ray.data.Dataset":
    """(band_key, doc_id) → candidate (src, dst) edges, src < dst.

    One all-to-all shuffle (sort by band_key), then one vectorized pass."""
    return sorted_group_apply(
        banded, "band_key", lambda b: _emit_pairs_block(b, max_bucket_size)
    )


def _dedupe_block(block: pa.Table) -> pa.Table:
    if block.num_rows == 0:
        return block
    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pa.table(
        {"src": pa.array(pairs[:, 0], pa.int64()), "dst": pa.array(pairs[:, 1], pa.int64())}
    )


def dedupe_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global distinct on (src, dst) — one sort shuffle of the (small) edge
    list so each candidate pair is verified exactly once."""
    return sorted_group_apply(edges, ["src", "dst"], _dedupe_block)


# ---------------------------------------------------------------------------
# verification
# ---------------------------------------------------------------------------


def _collect_edge_ids(edges: "ray.data.Dataset") -> np.ndarray:
    """Unique doc ids touched by any edge (streamed to the driver; bounded by
    2 × |edges|, which is tiny relative to the corpus)."""
    parts = []
    for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(b.column("src").to_numpy(zero_copy_only=False))
        parts.append(b.column("dst").to_numpy(zero_copy_only=False))
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


class _BroadcastVerifier:
    """Verifies edge batches against broadcast signatures.

    ``ray.put`` once on the driver; ``ray.get`` per task is zero-copy out of
    the local object store — the broadcast-small-side pattern
    (SURVEY.md §2.5 D2). Used as a plain task function via ``partial`` so no
    actor pool has to spin up for what is usually a small edge list."""

    def __init__(self, sig_ref, config: NearDupConfig):
        ids, simhash, minhash, texts = ray.get(sig_ref)
        self.ids = ids  # sorted int64
        self.simhash = simhash
        self.minhash = minhash
        self.texts = texts
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.ids, src)
        ib = np.searchsorted(self.ids, dst)
        cfg = self.config.signature()
        if isinstance(cfg, SimHashConfig):
            d = hamming64(self.simhash[ia], self.simhash[ib])
            keep = d <= cfg.threshold
            score = 1.0 - np.asarray(d, dtype=np.float64) / 64.0
        else:
            eq = (self.minhash[ia] == self.minhash[ib]).mean(axis=1)
            keep = eq >= cfg.threshold
            score = eq.astype(np.float64)
        if self.config.jaro_winkler_min is not None and self.texts is not None:
            jw_min = self.config.jaro_winkler_min
            kidx = np.flatnonzero(keep)
            for k in kidx:
                t1 = self.texts[ia[k]][:512]
                t2 = self.texts[ib[k]][:512]
                if jaro_winkler(t1, t2) < jw_min:
                    keep[k] = False
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
            }
        )


def verify_edges(
    edges: "ray.data.Dataset",
    signatures: "ray.data.Dataset",
    config: NearDupConfig,
) -> "ray.data.Dataset":
    """Exact verification of candidate edges → (src, dst, score).

    Broadcast strategy: the corpus NEVER shuffles — signatures are filtered
    by the (small) edge-id set in one streaming ``map_batches`` pass, the
    filtered slice is broadcast via ``ray.put``, and edges verify against it
    with binary-search lookups. For corpora where the duplicate-touched
    slice itself outgrows driver memory, switch to a hash-partitioned
    ``Dataset.join`` on src/dst (B-bucketed); the broadcast path is correct
    whenever the slice fits, which holds through ~10^8 candidate edges.
    """
    ids = _collect_edge_ids(edges)
    if len(ids) == 0:
        return edges.map_batches(
            lambda b: pa.table({"src": pa.array([], pa.int64()),
                                "dst": pa.array([], pa.int64()),
                                "score": pa.array([], pa.float64())}),
            batch_format="pyarrow",
        )
    ids_ref = ray.put(ids)
    cfg = config.signature()
    need_sim = isinstance(cfg, SimHashConfig)
    need_text = config.jaro_winkler_min is not None
    cols = ["doc_id"] + (["simhash"] if need_sim else ["minhash"]) + (
        ["text"] if need_text else []
    )

    def _filter(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        mask = np.isin(batch.column("doc_id").to_numpy(zero_copy_only=False), want,
                       assume_unique=False)
        return batch.select(cols).filter(pa.array(mask))

    slim = signatures.map_batches(_filter, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [b for b in slim.iter_batches(batch_size=1 << 18, batch_format="pyarrow")]
        or [pa.table({c: [] for c in cols})]
    )
    got_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(got_ids, kind="stable")
    sorted_ids = got_ids[order]
    simhash = minhash = texts = None
    if need_sim:
        simhash = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    else:
        n = tbl.num_rows
        flat = tbl.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        minhash = flat.reshape(n, config.minhash.num_perms)[order]
    if need_text:
        all_texts = tbl.column("text").to_pylist()
        texts = [all_texts[int(i)] for i in order]
    sig_ref = ray.put((sorted_ids, simhash, minhash, texts))

    def _verify(batch: pa.Table) -> pa.Table:
        return _BroadcastVerifier(sig_ref, config)(batch)

    return edges.map_batches(_verify, batch_format="pyarrow", batch_size=1 << 16)


def verify_edges_join(
    edges: "ray.data.Dataset",
    signatures: "ray.data.Dataset",
    config: NearDupConfig,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Fully-distributed verification via two hash-partitioned joins — the
    scale path for corpora where even the edge-involved signature slice
    outgrows the driver/object-store broadcast (dup-heavy crawls).

    edges ⋈ signatures ON src → ⋈ signatures ON dst, then the vectorized
    metric filter. Each join shuffles the (small) edge list plus one pass of
    the signature table partitioned on doc_id; the corpus text never moves.
    """
    cfg = config.signature()
    is_simhash = isinstance(cfg, SimHashConfig)
    sig_col = "simhash" if is_simhash else "minhash"
    if is_simhash:
        slim = signatures.select_columns(["doc_id", sig_col])
    else:
        # Acero's hash join rejects fixed_size_list payloads — pack the
        # minhash signature into a binary column for the ride
        num_perms_pack = config.minhash.num_perms

        def _pack(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            flat = batch.column("minhash").combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            ).astype(np.uint32)
            mat = flat.reshape(n, num_perms_pack)
            blobs = [mat[i].tobytes() for i in range(n)]
            return pa.table(
                {"doc_id": batch.column("doc_id"),
                 "minhash": pa.array(blobs, pa.binary())}
            )

        slim = signatures.map_batches(_pack, batch_format="pyarrow", batch_size=None)

    j1 = edges.select_columns(["src", "dst"]).join(
        slim,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("doc_id",),
        right_suffix="_src",
    )
    sig_src = sig_col if sig_col in j1.schema().names else f"{sig_col}_src"
    j1 = j1.rename_columns({sig_col_name: "sig_src" for sig_col_name in [sig_src]})
    j2 = j1.join(
        slim,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("doc_id",),
        right_suffix="_dst",
    )
    sig_dst = sig_col if sig_col in j2.schema().names else f"{sig_col}_dst"
    j2 = j2.rename_columns({sig_col_name: "sig_dst" for sig_col_name in [sig_dst]})

    if is_simhash:
        threshold = cfg.threshold

        def _score(batch: pa.Table) -> pa.Table:
            a = batch.column("sig_src").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = batch.column("sig_dst").to_numpy(zero_copy_only=False).astype(np.uint64)
            d = hamming64(a, b)
            keep = d <= threshold
            out = batch.select(["src", "dst"]).filter(pa.array(keep))
            return out.append_column(
                "score", pa.array(1.0 - np.asarray(d)[keep] / 64.0, pa.float64())
            )

    else:
        threshold = cfg.threshold
        num_perms = config.minhash.num_perms

        def _score(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            a = np.frombuffer(
                b"".join(batch.column("sig_src").to_pylist()), dtype=np.uint32
            ).reshape(n, num_perms)
            b = np.frombuffer(
                b"".join(batch.column("sig_dst").to_pylist()), dtype=np.uint32
            ).reshape(n, num_perms)
            eq = (a == b).mean(axis=1)
            keep = eq >= threshold
            out = batch.select(["src", "dst"]).filter(pa.array(keep))
            return out.append_column("score", pa.array(eq[keep], pa.float64()))

    return j2.map_batches(_score, batch_format="pyarrow", batch_size=1 << 14)
