"""The standing ANN quality sweep (VERDICT r13 next #3; r14 next #5):
recall@10 vs brute force over the FULL knob grid — refine_iters ×
n_probe for IVF, refine_iters × n_probe × rerank for IVF-PQ — on the
driver testdata embeddings, so every recall claim in SCALE.md is
re-derivable from this one script.

Run:  python scripts/refine_centroids_ab.py [sf_dir]
Emits one JSON line per grid point (axes named in the line; rerank=0
means ADC-only). Uses the same query set as the catalog entries
(vec_id % 20 == 0) and the brute-force cosine top-10 as ground truth.
Each index is built ONCE per refine setting and probed across all
(n_probe, rerank) points — the build-once/probe-forever shape the
stored artifact has in production.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_vortex_spark.catalog import load  # noqa: E402
from duckdb_vortex_spark.operators.similarity import (  # noqa: E402
    ivf_index,
    ivf_probe,
    ivfpq_index,
    ivfpq_probe,
    topk_bruteforce,
)
from duckdb_vortex_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("refine-ab", cpus=8)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    base: dict = {}
    for r in topk_bruteforce(q, emb, k=10).collect():
        base.setdefault(r.query_id, set()).add(r.cand_id)

    def recall(df) -> float:
        got: dict = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.cand_id)
        hits = sum(len(base[k] & got.get(k, set())) for k in base)
        return hits / sum(len(v) for v in base.values())

    for refine in (0, 1, 2):
        idx = ivf_index(emb, n_clusters=16, refine_iters=refine)
        for n_probe in (2, 4):
            rec = recall(ivf_probe(idx, q, k=10, n_probe=n_probe))
            print(json.dumps({
                "family": "ivf", "refine_iters": refine,
                "n_probe": n_probe, "recall_at_10": round(rec, 4),
                "sf_dir": sf_dir,
            }), flush=True)
    for refine in (0, 1):
        pidx = ivfpq_index(emb, n_clusters=16, refine_iters=refine)
        for n_probe in (2, 4):
            for rerank in (0, 20, 50):
                out = (
                    ivfpq_probe(pidx, q, k=10, n_probe=n_probe)
                    if rerank == 0
                    else ivfpq_probe(
                        pidx, q, k=10, n_probe=n_probe,
                        rerank=rerank, corpus_df=emb,
                    )
                )
                print(json.dumps({
                    "family": "ivfpq", "refine_iters": refine,
                    "n_probe": n_probe, "rerank": rerank,
                    "recall_at_10": round(recall(out), 4),
                    "sf_dir": sf_dir,
                }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
