#!/usr/bin/env python3
"""Round-16 optimization checklist: every benched query, grouped by
family, with the round's before/after seconds, its frozen floor, and
the examination status. Emits markdown to stdout.

Usage: gen_r16_checklist.py <before_bench.json> <after_bench.json>
"""
import json
import re
import sys

CHANGED = {
    "q_hits": "cut-before-max (half the per-round joins)",
    "dedup_lsh_tune": "3 nested band joins fused to 1",
    "lake_maintenance": "1 liveness pass/store + overlapped stores",
    "lake_compact_exec": "4 batch writes -> 1 partitioned write",
    "lake_fsck": "universe checkpointed once (plan 3000->1452 lines)",
    "ann_recall": "4 count actions -> 1 fused job",
    "ann_probe_sweep": "12 count actions -> 1 fused job",
}
REJECTED = {
    "text_bpe": "delta pair-counting measured 2x slower; reverted",
    "text_bpe_encode": "same bpeTrain experiment; reverted",
    "text_fertility": "same bpeTrain experiment; reverted",
    "q_pagerank": "checkpoint-every-2-rounds: no diff vs control; reverted",
}
EXAMINED = {
    "ann_knn_graph", "ann_graph_append", "ann_graph_expand",
    "q_neighborhood", "q_neighborhood_k", "q_ppr", "q_bfs", "q_sssp",
    "q_msf", "q_kcore", "q_components", "q_communities", "q_linkpred",
    "q_copurchase", "q_triangles", "q_clustering", "lake_tree_get",
    "lake_rebalance_exec", "q20_potential", "q2_mincost", "q9_profit",
    "dedup_minhash_lsh", "dedup_embedding", "emb_kmeans", "ann_ivf",
    "ann_ivf_indexed", "ann_pq", "ann_ivfpq", "ann_lsh",
    "ann_bruteforce", "emb_hubness", "multimodal_e2e", "pipeline_e2e",
    "q_mad_outliers", "multimodal_afp", "q_winsorize", "q_item_sim",
    "q_basket_lift", "dedup_clusters", "dedup_survivors",
    "ann_ivfpq_live", "dedup_containment", "dedup_ngram_exact",
    "q_compact_exec", "lake_chunk_split",
}

FAMILIES = [
    ("lake", lambda n: n.startswith("lake_")),
    ("relational/TPC-H", lambda n: n.startswith(("q1", "q2", "q3", "q4",
        "q5", "q6", "q7", "q8", "q9")) or n in {"profile_table"} or (
        n.startswith("q_") and not n.startswith((
            "q_pagerank", "q_bfs", "q_triangles", "q_clustering",
            "q_components", "q_hits", "q_ppr", "q_kcore", "q_sssp",
            "q_msf", "q_linkpred", "q_communities", "q_neighborhood",
            "q_copurchase")))),
    ("graph", lambda n: n.startswith(("q_pagerank", "q_bfs",
        "q_triangles", "q_clustering", "q_components", "q_hits",
        "q_ppr", "q_kcore", "q_sssp", "q_msf", "q_linkpred",
        "q_communities", "q_neighborhood", "q_copurchase"))),
    ("dedup", lambda n: n.startswith("dedup_") or n == "decontaminate"),
    ("similarity", lambda n: n.startswith(("ann_", "emb_")) or
        n == "decontaminate_semantic"),
    ("text", lambda n: n.startswith("text_")),
    ("multimodal", lambda n: n.startswith("multimodal_")),
    ("pipeline/sampling", lambda n: n.startswith(("pipeline_",
        "sample_", "pack_", "shard_", "export_"))),
]


def fam(n):
    for name, pred in FAMILIES:
        if pred(n):
            return name
    return "formats/other"


def main():
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    floors = {}
    for m in re.finditer(r'"([a-z0-9_]+)"\s*->\s*([0-9.]+)',
                         open("src/main/scala/graft/BenchBaseline.scala").read()):
        floors[m.group(1)] = float(m.group(2))
    rows = []
    for n in sorted(set(before) | set(after)):
        if n in CHANGED:
            status = "CHANGED: " + CHANGED[n]
        elif n in REJECTED:
            status = "experiment rejected: " + REJECTED[n]
        elif n in EXAMINED:
            status = "examined, left alone (see narrative)"
        else:
            status = "family-audited (bench-vs-floor + PLANS.json)"
        rows.append((fam(n), n, before.get(n), after.get(n),
                     floors.get(n), status))
    rows.sort(key=lambda r: (r[0], r[1]))
    print("| family | query | before s | after s | floor | status |")
    print("|---|---|---|---|---|---|")
    for f, n, b, a, fl, s in rows:
        fb = f"{b:.2f}" if b is not None else "—"
        fa = f"{a:.2f}" if a is not None else "—"
        ff = f"{fl:.2f}" if fl is not None else "—"
        print(f"| {f} | {n} | {fb} | {fa} | {ff} | {s} |")
    tb = sum(v for v in before.values())
    ta = sum(v for v in after.values())
    print(f"\nTotals: before {tb:.1f} s ({len(before)} queries), "
          f"after {ta:.1f} s ({len(after)} queries).")


if __name__ == "__main__":
    main()
