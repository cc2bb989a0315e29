"""ANN preset tuner: sweep the recall-vs-cost knobs the round-9
``ann_recall`` eval exposed as undeployable (recall@5 = 0.02 single-table
LSH / 0.12 multiprobe / 0.52 IVF at the shipped presets).

Method: exact numpy replicas of the Spark math — same seeded
``random.Random`` hyperplanes, same sign-of-dot buckets, the same
md5-hash-seeded fixed-point Lloyd for IVF, multi-table union AND
bit-flip probing (Lv et al. multi-probe) — swept over the knob grid,
reporting recall@k and the candidate fraction (the cost axis: expected
fraction of the corpus scored per query, which is what scales to
100 TB). Spark parity of the replica was spot-checked at equal recall
on sf0.01 before trusting the sweep; wall-times for finalists were
measured separately with the actual operators (SCALE.md round 10).

Usage:
    python tools/tune_ann.py    # full grid at sf0.1, Pareto summary
"""
from __future__ import annotations

import json
import random
import sys
import time

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.1"
DIM = 64
K = 5
SEED = 42
N_QUERIES = 100  # more than the catalog's 10 for a stable estimate


def hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = random.Random(seed)
    return np.array(
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    )


def buckets(vecs: np.ndarray, n_planes: int, seed: int) -> np.ndarray:
    pl = hyperplanes(vecs.shape[1], n_planes, seed)
    bits = (vecs @ pl.T) > 0  # (n, planes)
    return bits @ (1 << np.arange(n_planes))


def load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], vecs[order]


def exact_topk(vecs: np.ndarray, ids: np.ndarray, qidx: np.ndarray) -> dict:
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs[qidx] @ vecs.T) / (norms[qidx][:, None] * norms[None, :])
    out = {}
    for row, qi in enumerate(qidx):
        s = sims[row].copy()
        s[qi] = -np.inf
        # ties broken by neighbor_id asc, like the Spark/DuckDB top-k
        ordkey = np.lexsort((ids, -np.round(s, 6)))
        out[ids[qi]] = set(ids[ordkey[:K]])
    return out


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    """XOR masks for all bucket ids within Hamming distance
    <= probe_bits of a signature (Lv et al. multi-probe LSH)."""
    from itertools import combinations

    masks = [0]
    for m in range(1, probe_bits + 1):
        for bits in combinations(range(n_planes), m):
            masks.append(sum(1 << b for b in bits))
    return masks


def lsh_recall(
    vecs: np.ndarray,
    ids: np.ndarray,
    qidx: np.ndarray,
    truth: dict,
    n_planes: int,
    n_tables: int,
    probe_bits: int = 0,
) -> tuple[float, float]:
    """Returns (recall@K, mean candidate fraction of corpus)."""
    n = len(ids)
    masks = probe_masks(n_planes, probe_bits)
    cand: list[set] = [set() for _ in qidx]
    for t in range(n_tables):
        b = buckets(vecs, n_planes, SEED + t)
        by_bucket: dict = {}
        for i, bb in enumerate(b):
            by_bucket.setdefault(bb, []).append(i)
        for row, qi in enumerate(qidx):
            for mk in masks:
                cand[row].update(by_bucket.get(b[qi] ^ mk, []))
    norms = np.linalg.norm(vecs, axis=1)
    hits, total_cand = 0, 0
    for row, qi in enumerate(qidx):
        cs = np.array(sorted(cand[row] - {qi}), dtype=int)
        total_cand += len(cs)
        if len(cs) == 0:
            continue
        s = (vecs[qi] @ vecs[cs].T) / (norms[qi] * norms[cs])
        ordkey = np.lexsort((ids[cs], -np.round(s, 6)))
        top = set(ids[cs[ordkey[:K]]])
        hits += len(top & truth[ids[qi]])
    return hits / (K * len(qidx)), total_cand / (len(qidx) * n)


def kmeans_centroids(
    ids: np.ndarray,
    vecs: np.ndarray,
    k: int,
    n_iter: int,
    scale: int = 1_000_000,
) -> np.ndarray:
    """Exact numpy replica of operators.similarity.kmeans_fit: seeds =
    k ids with the smallest (md5-60bit-hash, id); each step assigns by
    round(v·v - 2 v·c + c·c, 6) with cid tiebreak and recomputes
    fixed-point means sum(round(x*scale))/(scale*n)."""
    import hashlib

    h = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids]
    )
    order = np.lexsort((ids, h))[:k]
    # keep ORIGINAL cid values throughout: the Spark fit drops empty
    # clusters from the centroid table but surviving cids keep their
    # ids, and assignment tie-breaks on (d2, cid) — compacting/
    # renumbering here would desync tie-breaks and probe identities
    # from the shipped operator (review finding, round 10)
    cents: dict[int, np.ndarray] = {
        cid: vecs[order[cid]].copy() for cid in range(len(order))
    }
    for _ in range(n_iter):
        cids = sorted(cents)
        C = np.array([cents[c] for c in cids])
        d2 = np.round(
            (vecs**2).sum(1)[:, None]
            - 2.0 * (vecs @ C.T)
            + (C**2).sum(1)[None, :],
            6,
        )
        # argmin over columns sorted by cid == (d2, cid) tie-break
        assign = np.array(cids)[d2.argmin(1)]
        new: dict[int, np.ndarray] = {}
        for c in cids:
            members = vecs[assign == c]
            if len(members) == 0:
                continue  # empty clusters drop out, cids keep values
            new[c] = (
                np.round(members * scale).astype(np.int64).sum(0)
                / (float(scale) * len(members))
            )
        cents = new
    cids = sorted(cents)
    return np.array([cents[c] for c in cids]), np.array(cids)


def ivf_recall(
    vecs: np.ndarray,
    ids: np.ndarray,
    qidx: np.ndarray,
    truth: dict,
    cents: np.ndarray,
    n_probe: int,
) -> tuple[float, float]:
    d2_all = np.round(
        (vecs**2).sum(1)[:, None]
        - 2.0 * (vecs @ cents.T)
        + (cents**2).sum(1)[None, :],
        6,
    )
    assign = d2_all.argmin(1)
    norms = np.linalg.norm(vecs, axis=1)
    hits, total_cand = 0, 0
    for qi in qidx:
        probed = np.argsort(d2_all[qi], kind="stable")[:n_probe]
        cs = np.where(np.isin(assign, probed))[0]
        cs = cs[cs != qi]
        total_cand += len(cs)
        if len(cs) == 0:
            continue
        s = (vecs[qi] @ vecs[cs].T) / (norms[qi] * norms[cs])
        ordkey = np.lexsort((ids[cs], -np.round(s, 6)))
        top = set(ids[cs[ordkey[:K]]])
        hits += len(top & truth[ids[qi]])
    return hits / (K * len(qidx)), total_cand / (len(qidx) * len(ids))


def main() -> None:
    ids, vecs = load(SF_DIR)
    qidx = np.arange(min(N_QUERIES, len(ids)))
    truth = exact_topk(vecs, ids, qidx)
    print(f"corpus={len(ids)} queries={len(qidx)} k={K} sf_dir={SF_DIR}")
    rows = []
    for n_planes in (2, 3, 4, 5, 6, 8):
        for n_tables in (1, 2, 4, 8, 12, 16, 24, 32):
            t0 = time.time()
            r, frac = lsh_recall(vecs, ids, qidx, truth, n_planes, n_tables)
            rows.append(
                {
                    "n_planes": n_planes,
                    "n_tables": n_tables,
                    "recall_at_5": round(r, 4),
                    "cand_frac": round(frac, 4),
                    "numpy_s": round(time.time() - t0, 2),
                }
            )
            print(json.dumps(rows[-1]))
    print("--- bit-flip multiprobe (query-side probing, small index) ---")
    for n_planes, n_tables, pb in (
        (8, 4, 1), (8, 8, 1), (8, 16, 1), (8, 8, 2), (8, 4, 2),
        (10, 8, 2), (10, 12, 2), (10, 16, 2), (12, 8, 2), (12, 8, 3),
        (12, 12, 3), (10, 8, 3), (14, 8, 3), (16, 8, 3), (16, 8, 4),
    ):
        r, frac = lsh_recall(vecs, ids, qidx, truth, n_planes, n_tables, pb)
        rows.append(
            {
                "kind": "multiprobe",
                "n_planes": n_planes,
                "n_tables": n_tables,
                "probe_bits": pb,
                "recall_at_5": round(r, 4),
                "cand_frac": round(frac, 4),
            }
        )
        print(json.dumps(rows[-1]))
    print("--- IVF-kmeans (exact replica of kmeans_fit) ---")
    for k_cent in (8, 16, 32):
        for n_iter in (2, 4):
            cents, _cids = kmeans_centroids(ids, vecs, k_cent, n_iter)
            for n_probe in (1, 2, 3, 4, 6, 8, 12, 16):
                if n_probe > len(cents):
                    continue
                r, frac = ivf_recall(vecs, ids, qidx, truth, cents, n_probe)
                rows.append(
                    {
                        "kind": "ivf",
                        "n_centroids": k_cent,
                        "n_iter": n_iter,
                        "n_probe": n_probe,
                        "recall_at_5": round(r, 4),
                        "cand_frac": round(frac, 4),
                    }
                )
                print(json.dumps(rows[-1]))
    # Pareto summary: cheapest config reaching each recall tier
    for tier in (0.5, 0.8, 0.9, 0.95):
        ok = [x for x in rows if x["recall_at_5"] >= tier]
        if ok:
            best = min(ok, key=lambda x: x["cand_frac"])
            print(f"tier>={tier}: {json.dumps(best)}")


if __name__ == "__main__":
    sys.exit(main())
