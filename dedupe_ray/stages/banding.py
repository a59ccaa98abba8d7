"""LSH band-key emission — the blocking step that replaces the VP-tree.

The reference answers "which records are within radius r" with an in-memory
vantage-point tree (/root/reference/vptree/vptree.go:71-157) — inherently
single-process. At cluster scale the same question becomes *blocking*: emit
B ``(band_key, doc_id)`` rows per record such that any pair within the match
radius shares at least one band key with high probability, then let ONE
``groupby(band_key)`` shuffle co-locate candidates (SURVEY.md §2.4 I1).

Vectorized: band keys are computed with numpy reshapes/mixes — no Python
loop over rows, no per-row flat_map. Each input row of n bytes becomes
B × 16-byte rows — deliberately NOT carrying signatures through the shuffle
(a ×B blowup of 0.5-1 KB signatures would dominate network at 10^12 docs);
verification re-acquires signatures via broadcast or join (candidates.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedupe_ray.config import MinHashConfig, SimHashConfig

__all__ = ["minhash_band_table", "simhash_band_table", "band_emitter"]


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def minhash_band_table(batch: pa.Table, cfg: MinHashConfig,
                       id_col: str = "doc_id", sig_col: str = "minhash") -> pa.Table:
    """(band_key: uint64, doc_id: int64) — B rows per input row.

    Band key = mix of the band's R uint32 slots plus the band index, so keys
    from different bands never collide into one bucket.
    """
    n = batch.num_rows
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sig = batch.column(sig_col)
    flat = sig.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(n, cfg.num_perms).astype(np.uint64)  # (n, K)
    bands = mat.reshape(n, cfg.bands, cfg.rows)  # (n, B, R)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, cfg.bands), dtype=np.uint64)
        for r in range(cfg.rows):
            acc = _mix64(acc + bands[:, :, r] * np.uint64(0x9E3779B97F4A7C15))
        acc = _mix64(acc + np.arange(cfg.bands, dtype=np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9))
    return pa.table(
        {
            "band_key": pa.array(acc.reshape(-1), pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, cfg.bands), pa.int64()),
        }
    )


def simhash_band_table(batch: pa.Table, cfg: SimHashConfig,
                       id_col: str = "doc_id", sig_col: str = "simhash") -> pa.Table:
    """(band_key, doc_id) from bit-blocks of the 64-bit simhash.

    ``combo=1``: B blocks of 64/B bits; any pair at Hamming distance ≤ B-1
    shares an identical block (pigeonhole). ``combo=k``: one key per
    C(B, k)-combination of blocks, each requiring its k blocks to match
    jointly (Manku et al., WWW'07 multi-table simhash) — any pair within
    radius B-k leaves some k blocks untouched, so recall is guaranteed
    through ``threshold <= B - k`` with far larger (k·64/B-bit) keys and
    correspondingly fewer random collisions.
    """
    from itertools import combinations

    n = batch.num_rows
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sims = batch.column(sig_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    bits = 64 // cfg.bands
    mask = np.uint64((1 << bits) - 1)
    blocks = np.empty((cfg.bands, n), dtype=np.uint64)
    for b in range(cfg.bands):
        blocks[b] = (sims >> np.uint64(b * bits)) & mask
    combos = list(combinations(range(cfg.bands), cfg.combo))
    keys = np.empty((len(combos), n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for ci, combo in enumerate(combos):
            acc = np.full(n, np.uint64(ci) * np.uint64(0xBF58476D1CE4E5B9), dtype=np.uint64)
            for b in combo:
                acc = _mix64(acc + blocks[b] * np.uint64(0x9E3779B97F4A7C15))
            keys[ci] = acc
    return pa.table(
        {
            "band_key": pa.array(keys.T.reshape(-1), pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, len(combos)), pa.int64()),
        }
    )


def band_emitter(cfg: MinHashConfig | SimHashConfig):
    """map_batches-ready closure for the configured algorithm."""
    if isinstance(cfg, MinHashConfig):
        return lambda batch: minhash_band_table(batch, cfg)
    return lambda batch: simhash_band_table(batch, cfg)
