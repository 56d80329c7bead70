#!/usr/bin/env python
"""Gate-strength evidence: prove the hash gates DISCRIMINATE.

A hash gate that never goes red proves nothing unless a wrong
implementation would actually fail it ("zero-output oracles are
trivially green" — the r5 audit concern). This tool runs a set of
documented MUTATIONS: for each named query it executes the REAL
Spark implementation and a DELIBERATELY-WRONG oracle (the oracle
perturbed the way a plausible implementation bug would perturb the
result — a flipped bit rule, a dropped smoothing floor, a lost dedup
pass, an off-by-one frame boundary), and asserts the driver-style
comparison (row count + column-sorted value multiset) CATCHES it.
Every mutation must MISMATCH; the unmutated oracle must MATCH.

Run: python tools/gate_mutations.py [--sf /root/testdata/sf0.01]
Exit 0 = every gate discriminates; the per-mutation verdicts print
as a table (recorded in FIXTURES.md §gate-strength).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from check_oracle import rows_multiset  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# (query, bug the mutation simulates, old_fragment, new_fragment) —
# each fragment pair rewrites the ORACLE so it computes what the
# buggy implementation WOULD have computed; the real Spark result
# must then hash-mismatch it.
MUTATIONS: list[tuple[str, str, str, str]] = [
    (
        "docs_image_dhash",
        "dHash bit rule inverted (>= instead of >)",
        "px[(k // 8) * 9 + (k % 8) + 2] > px[(k // 8) * 9 + (k % 8) + 1]",
        "px[(k // 8) * 9 + (k % 8) + 2] >= px[(k // 8) * 9 + (k % 8) + 1]",
    ),
    (
        "docs_image_dhash",
        "row stride wrong (8-wide grid indexing on the 9-wide grid)",
        "px[(k // 8) * 9 + (k % 8) + 2]",
        "px[(k // 8) * 8 + (k % 8) + 2]",
    ),
    (
        "docs_image_neardup",
        "Hamming verify lost (blocking emits unverified far pairs)",
        "bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3",
        "bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 12",
    ),
    (
        "docs_dsir_score_new",
        "unseen-bucket features silently dropped (inner-join scorer)",
        "FROM df_doc LEFT JOIN m USING (bk)",
        "FROM df_doc JOIN m USING (bk)",
    ),
    (
        "docs_dsir_selection",
        "Laplace smoothing dropped from the ratio numerator",
        "((tc + 1) * (R + 10007) * 1000000)",
        "(tc * (R + 10007) * 1000000)",
    ),
    (
        "docs_video_frame_containment",
        "frame boundary off by one (65-byte chunks hashed as 64)",
        "md5(substr(text, CAST(k * 64 + 1 AS BIGINT), 64))",
        "md5(substr(text, CAST(k * 64 + 1 AS BIGINT), 65))",
    ),
    (
        "docs_audio_wav_roundtrip",
        "8-bit PCM centering forgotten (raw unsigned samples)",
        "unicode(substr(t, i, 1)) - 128",
        "unicode(substr(t, i, 1))",
    ),
    (
        "docs_multimodal_curation",
        "keeper rule lost (every clustered doc dropped, reps too)",
        "(c.id IS NULL OR c.rep = d.doc_id) AS img_kept",
        "(c.id IS NULL) AS img_kept",
    ),
    (
        "docs_image_png_roundtrip",
        "truncated decode accepted (last raster byte lost)",
        "CAST(list_sum(g.px) AS BIGINT) AS px_sum",
        "CAST(list_sum(g.px[1:71]) AS BIGINT) AS px_sum",
    ),
    (
        "docs_image_png_roundtrip",
        "dHash replay bit rule inverted on the DECODED grid",
        "FROM g JOIN dh USING (doc_id)",
        "FROM g JOIN (SELECT doc_id, hi AS lo, lo AS hi FROM dh) dh "
        "USING (doc_id)",
    ),
    # NOTE: an ma/mb side-swap mutation is NOT discriminable on this
    # fixture — prefix-family near-dups match frame-for-frame, so
    # ma == mb on every qualifying pair; the denominator-side mutation
    # below catches the same wrong-side bug class through the sizes.
    (
        "docs_video_perceptual_containment",
        "containment normalized by the LARGER clip's frame count",
        "/ least(sa.n, sb.n)",
        "/ greatest(sa.n, sb.n)",
    ),
    (
        "docs_video_perceptual_containment",
        "Hamming verify lost on the frame hashes (far frames matched)",
        "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3), "
        "agg AS",
        "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 12), "
        "agg AS",
    ),
    (
        "docs_image_dedup_incremental",
        "orientation swapped (index ids reported as new ids)",
        "CASE WHEN a.doc_id % 2 = 1 THEN a.doc_id ELSE b.doc_id END "
        "AS new_id",
        "CASE WHEN a.doc_id % 2 = 1 THEN b.doc_id ELSE a.doc_id END "
        "AS new_id",
    ),
    (
        "docs_audio_fingerprint",
        "energy-difference bit rule inverted (>= instead of >)",
        "CASE WHEN e[k+2] > e[k+1]",
        "CASE WHEN e[k+2] >= e[k+1]",
    ),
    (
        "docs_audio_perceptual_neardup",
        "Hamming verify lost (blocking emits unverified far pairs)",
        "WHERE bit_count(xor(a.ahash_lo, b.ahash_lo)) + "
        "bit_count(xor(a.ahash_hi, b.ahash_hi)) <= 3",
        "WHERE bit_count(xor(a.ahash_lo, b.ahash_lo)) + "
        "bit_count(xor(a.ahash_hi, b.ahash_hi)) <= 12",
    ),
    (
        "docs_audio_energy_topk",
        "envelope dot truncated to 64 of the 65 frames",
        "list_sum(list_transform(range(1, 66), i -> a.e[i] * aqs.qe[i]))",
        "list_sum(list_transform(range(1, 65), i -> a.e[i] * aqs.qe[i]))",
    ),
    (
        "emb_sq8_ann_topk",
        "dequantization zero-point dropped (raw code-scale dot)",
        "mn[i] * 255 + c[i] * (mx[i] - mn[i])",
        "c[i] * (mx[i] - mn[i])",
    ),
    (
        "emb_sq8_recall_gate",
        "dequantization zero-point dropped (raw code-scale dot)",
        "mn[i] * 255 + c[i] * (mx[i] - mn[i])",
        "c[i] * (mx[i] - mn[i])",
    ),
    # the sf0.01 fixture has NO cross-side pairs at radius 3 (min
    # cross hamming 5), so this widened-radius mutation is exactly the
    # "blocking emits far pairs" bug class the all-kept ledger would
    # otherwise never distinguish (the positive drop path is pinned by
    # test_simhash_decontamination_drops_planted_neardup)
    (
        "docs_simhash_decontamination",
        "Hamming verify lost on the benchmark probe (radius 3 -> 12)",
        "bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3",
        "bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 12",
    ),
    (
        "docs_shard_assignment",
        "one shard silently missing from the HRW candidate set",
        "WHERE shard < 16 GROUP BY 1",
        "WHERE shard < 15 GROUP BY 1",
    ),
    (
        "events_zorder_layout",
        "interleave order swapped (dim A at odd bit positions)",
        "(((ub >> k) & 1) << (2 * k)) + (((vb >> k) & 1) << (2 * k + 1))",
        "(((ub >> k) & 1) << (2 * k + 1)) + (((vb >> k) & 1) << (2 * k))",
    ),
    (
        "docs_constraint_audit",
        "metric rounding rule wrong (ceil instead of floor on the mean)",
        "CAST(floor(avg(n_chars)) AS BIGINT) AS mean_n_chars",
        "CAST(ceil(avg(n_chars)) AS BIGINT) AS mean_n_chars",
    ),
    (
        "docs_weighted_sample",
        "weight off by one (zero-weight shorts dropped, tickets shifted)",
        "1 + coalesce(n_chars, 0) // 64 AS weight",
        "coalesce(n_chars, 0) // 64 AS weight",
    ),
    (
        "docs_video_scene_cuts",
        "cut threshold confused with unrelated-content mean (12 -> 40)",
        "+ bit_count(xor(hi, phi)) >= 12",
        "+ bit_count(xor(hi, phi)) >= 40",
    ),
    (
        "docs_video_scene_cuts",
        "hash-word pairing bug (hi compared against the lagged LO word)",
        "bit_count(xor(lo, plo)) + bit_count(xor(hi, phi))",
        "bit_count(xor(lo, plo)) + bit_count(xor(hi, plo))",
    ),
    (
        "docs_scene_keyframes",
        "keyframe picked at the cut boundary instead of mid-scene",
        "CAST(min(k) + (count(*) - 1) // 2 AS BIGINT) AS keyframe_k",
        "CAST(min(k) AS BIGINT) AS keyframe_k",
    ),
    (
        "docs_scene_cuts_streamed",
        "cut threshold confused with unrelated-content mean (12 -> 40)",
        "+ bit_count(xor(hi, phi)) >= 12",
        "+ bit_count(xor(hi, phi)) >= 40",
    ),
    (
        "docs_scene_cuts_from_index",
        "from-index path's cut threshold drifts from the direct path's",
        "+ bit_count(xor(hi, phi)) >= 12",
        "+ bit_count(xor(hi, phi)) >= 40",
    ),
    (
        "docs_scene_threshold_sweep",
        "first frame not counted as a scene opener (NULL distance dropped)",
        "CASE WHEN d IS NULL OR d >= threshold THEN 1 ELSE 0 END",
        "CASE WHEN d >= threshold THEN 1 ELSE 0 END",
    ),
    (
        "docs_video_shared_scenes",
        "multi-shot scene filter lost (single-shot scenes admitted — "
        "the r9-probed promiscuity regime)",
        "GROUP BY doc_id, scene_id HAVING count(*) >= 4",
        "GROUP BY doc_id, scene_id HAVING count(*) >= 1",
    ),
    (
        "docs_video_shared_scenes",
        "hub cap collapsed to pair-only signatures (freq 3..12 "
        "signatures dropped before the join)",
        "HAVING count(*) <= 64",
        "HAVING count(*) <= 2",
    ),
    (
        "docs_video_shared_scenes",
        "containment normalized by the LARGER clip (least -> greatest)",
        "least(na, nb)",
        "greatest(na, nb)",
    ),
    (
        "docs_video_shared_scenes",
        "cut threshold drifts in the signature path (12 -> 40; the "
        "fragment rewrites BOTH the _SCENE_CTES copy and the sc2 "
        "re-derivation, so a consistent drift still changes which "
        "scenes exist and therefore every sequence signature)",
        "+ bit_count(xor(hi, phi)) >= 12",
        "+ bit_count(xor(hi, phi)) >= 40",
    ),
    (
        "docs_av_dedup_verdicts",
        "verdict radius drifts (confirmed/re_dubbed split at <= 30 "
        "instead of the registered radius-3 near-dup rule — the "
        "probe's bimodal gap means a sloppier threshold silently "
        "reclassifies the whole re_dubbed class)",
        "CASE WHEN shared_scenes > 0 AND audio_hamming <= 3 ",
        "CASE WHEN shared_scenes > 0 AND audio_hamming <= 30 ",
    ),
    (
        "docs_av_dedup_verdicts",
        "audio_only branch lost (report covers only scene pairs — "
        "the union with the anti-joined audio tier dropped)",
        "rep AS (SELECT * FROM spa UNION ALL SELECT * FROM aonly) ",
        "rep AS (SELECT * FROM spa) ",
    ),
    (
        "docs_av_dedup_verdicts",
        "anti-join inverted to semi (audio_only emits the pairs BOTH "
        "tiers flagged instead of the audio-only remainder)",
        "FROM apr ANTI JOIN spa ",
        "FROM apr SEMI JOIN spa ",
    ),
    (
        "docs_av_dedup_verdicts",
        "scene-pair hamming computed on the low word only (hi-word "
        "xor term dropped from the verdict join)",
        "bit_count(xor(a.ahash_hi, b.ahash_hi)) AS audio_hamming "
        "FROM prs p",
        "0 AS audio_hamming "
        "FROM prs p",
    ),
    (
        "docs_replica_placement",
        "replica picked as the LOWEST score instead of second-highest",
        "CAST(sum(CASE WHEN rn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_replica "
        "FROM r WHERE rn <= 2",
        "CAST(sum(CASE WHEN rn = 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_replica "
        "FROM r WHERE rn = 1 OR rn = 16",
    ),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from proglog_spark.queries import REGISTRY
    from proglog_spark.session import build_session

    spark = build_session(
        "gate-mutations", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    spark_cache: dict[str, tuple[list[str], list[tuple]]] = {}

    def spark_result(name):
        if name not in spark_cache:
            df = REGISTRY[name][0](spark, args.sf)
            spark_cache[name] = (df.columns, [tuple(r) for r in df.collect()])
        return spark_cache[name]

    def matches(name, sql) -> bool:
        cols, rows = spark_result(name)
        rel = con.sql(sql)
        orows = rel.fetchall()
        if len(rows) != len(orows) or sorted(cols) != sorted(rel.columns):
            return False
        return rows_multiset(cols, rows) == rows_multiset(
            list(rel.columns), orows
        )

    bad = 0
    for name, bug, old, new in MUTATIONS:
        sql = REGISTRY[name][1]
        if old not in sql:
            print(f"STALE    {name}: mutation fragment not found — update "
                  f"MUTATIONS for: {bug}")
            bad += 1
            continue
        if not matches(name, sql):
            print(f"BROKEN   {name}: unmutated oracle does not match!")
            bad += 1
            continue
        if matches(name, sql.replace(old, new)):
            print(f"WEAK     {name}: gate did NOT catch: {bug}")
            bad += 1
        else:
            print(f"CAUGHT   {name}: {bug}")
    print(("all mutations caught" if not bad else f"{bad} problems"))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
