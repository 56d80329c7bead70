"""Placement, audit, weighted-sampling, and scene-cut operator tests
— pure-Python model comparisons plus the properties each operator
sells (HRW minimal disruption, z-order per-file span bounds, one-pass
audit verdicts, PPSWOR weighted odds, perceptual scene segmentation).
"""

from __future__ import annotations

import hashlib
import tempfile

import pytest
from pyspark.sql import functions as F

from proglog_spark.operators import audit, placement, sampling


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hrw_model(key, n: int, salt: str = "hrw") -> int:
    return max(range(n), key=lambda s: (_h60(f"{salt}:{s}:{key}"), s))


# ---------------------------------------------------------------------------
# rendezvous (HRW) sharding
# ---------------------------------------------------------------------------


def test_rendezvous_matches_md5_argmax_model(spark):
    df = spark.range(0, 200).select(F.col("id").alias("k"))
    got = {
        r.k: r.s
        for r in df.select(
            "k", placement.rendezvous_shard(F.col("k"), 16).alias("s")
        ).collect()
    }
    assert got == {k: _hrw_model(k, 16) for k in range(200)}


def test_rendezvous_minimal_disruption(spark):
    """THE property HRW is for: growing 16 -> 17 shards only ever
    moves a key TO the new shard (never between old shards), and the
    moved fraction is ~1/17 of keys."""
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    both = df.select(
        placement.rendezvous_shard(F.col("k"), 16).alias("a"),
        placement.rendezvous_shard(F.col("k"), 17).alias("b"),
    ).collect()
    moved = [r for r in both if r.a != r.b]
    assert all(r.b == 16 for r in moved)
    # E[moved] = 2000/17 ~ 118; loose 3-sigma-ish band
    assert 60 <= len(moved) <= 190


def test_rendezvous_null_key_deterministic(spark):
    df = spark.createDataFrame([(None,), (None,)], "k STRING")
    vals = {
        r.s
        for r in df.select(
            placement.rendezvous_shard(F.col("k"), 16).alias("s")
        ).collect()
    }
    assert len(vals) == 1  # sentinel-hashed, not NULL-propagated

    with pytest.raises(ValueError, match="n_shards"):
        placement.rendezvous_shard(F.col("k"), 0)


def test_replica_placement_top2_properties(spark):
    """Replica = second-highest HRW score: never equals the primary,
    matches the pure-Python top-2 model, and a primary's keys have
    their replicas SPREAD over many other shards (no mod-N pairing)."""
    import hashlib

    from proglog_spark.operators.placement import rendezvous_scores

    def top2(key, n=16):
        scored = sorted(
            ((_h60(f"hrw:{s}:{key}"), s) for s in range(n)), reverse=True
        )
        return scored[0][1], scored[1][1]

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    ranked = F.array_sort(rendezvous_scores(F.col("k"), 16))
    got = {
        r.k: (r.p, r.r)
        for r in df.select(
            "k",
            F.element_at(ranked, -1).getField("shard").alias("p"),
            F.element_at(ranked, -2).getField("shard").alias("r"),
        ).collect()
    }
    assert got == {k: top2(k) for k in range(500)}
    assert all(p != r for p, r in got.values())
    # replicas of shard-0 primaries spread across >= 8 distinct shards
    spread = {r for p, r in got.values() if p == 0}
    assert len(spread) >= 8


# ---------------------------------------------------------------------------
# z-order layout keys
# ---------------------------------------------------------------------------


def _z_model(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for k in range(bits):
        z |= ((a >> k) & 1) << (2 * k)
        z |= ((b >> k) & 1) << (2 * k + 1)
    return z


def test_zorder_matches_bit_interleave_model(spark):
    rows = [(a, b) for a in (0, 1, 5, 127, 128, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", placement.zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got == {(a, b): _z_model(a, b) for a, b in rows}


def test_zorder_out_of_range_fails_loudly(spark):
    df = spark.createDataFrame([(256, 0)], "a LONG, b LONG")
    with pytest.raises(Exception, match="zorder_key"):
        df.select(placement.zorder_key(F.col("a"), F.col("b"))).collect()
    with pytest.raises(ValueError, match="bits"):
        placement.zorder_key(F.col("a"), F.col("b"), bits=0)


def test_zorder_file_spans_bound_both_dims(spark, sf_dir):
    """The pruning guarantee made executable: cutting files on z >> 10
    leaves each 8-bit dimension spanning at most a 32-bucket block
    inside any file (bits 0-4 of each dim live below the cut), so
    zone-map min/max prune on EITHER dimension."""
    from proglog_spark.queries import REGISTRY

    out = REGISTRY["events_zorder_layout"][0](spark, sf_dir).collect()
    assert out, "expected at least one file bucket"
    for r in out:
        assert r.max_ub - r.min_ub <= 31
        assert r.max_vb - r.min_vb <= 31


# ---------------------------------------------------------------------------
# declarative constraint audit
# ---------------------------------------------------------------------------


def test_audit_one_pass_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (4, "c")], "id LONG, s STRING"
    )
    out = audit.audit(
        df,
        [
            ("completeness_s", audit.completeness_micro(F.col("s")), 900000, None),
            ("uniqueness_id", audit.uniqueness_micro(F.col("id")), 1000000, None),
            ("min_id", F.min("id"), 1, 3),
            ("member_s", audit.membership_micro(F.col("s"), ("a", "b")), None, None),
        ],
    ).collect()
    got = {r.check_name: (r.observed, r.passed) for r in out}
    assert got == {
        "completeness_s": (750000, False),   # 3/4 non-null
        "uniqueness_id": (750000, False),    # 3 distinct / 4 rows
        "min_id": (1, True),
        "member_s": (666666, True),          # 2/3 non-null in set, unbounded
    }
    # output is ordered by name (total order for the hash gate)
    assert [r.check_name for r in out] == sorted(got)


def test_audit_empty_input_fails_bounded_constraints(spark):
    df = spark.createDataFrame([], "id LONG")
    out = audit.audit(
        df, [("completeness_id", audit.completeness_micro(F.col("id")), 1, None)]
    ).collect()
    assert out[0].observed is None and out[0].passed is False


def test_audit_duplicate_names_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unique"):
        audit.audit(df, [("x", F.min("id"), None, None), ("x", F.max("id"), None, None)])


# ---------------------------------------------------------------------------
# PPSWOR bottom-k weighted sampling
# ---------------------------------------------------------------------------


def _ppswor_model(rows, k, salt="ws"):
    pri = []
    for key, w in rows:
        if w is None or w <= 0:
            continue
        t = min(_h60(f"{salt}:{key}:{i}") for i in range(w))
        pri.append((t, key, w))
    pri.sort()
    return [(key, w, t, i + 1) for i, (t, key, w) in enumerate(pri[:k])]


def test_ppswor_matches_md5_model(spark):
    rows = [(i, 1 + i % 7) for i in range(50)]
    df = spark.createDataFrame(rows, "doc LONG, w LONG")
    got = [
        (r.key, r.weight, r.ticket, r.rank)
        for r in sampling.ppswor_bottom_k(df, "doc", "w", k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == _ppswor_model(rows, 10)


def test_ppswor_bottom_k_is_nested_and_guards(spark):
    rows = [(i, 1 + i % 5) for i in range(60)] + [(99, 0), (98, None)]
    df = spark.createDataFrame(rows, "doc LONG, w LONG")
    top10 = {r.key for r in sampling.ppswor_bottom_k(df, "doc", "w", 10).collect()}
    top25 = {r.key for r in sampling.ppswor_bottom_k(df, "doc", "w", 25).collect()}
    assert top10 <= top25          # bottom-k sketches nest
    assert 99 not in top25 and 98 not in top25  # w<=0 / NULL excluded
    with pytest.raises(ValueError, match="k"):
        sampling.ppswor_bottom_k(df, "doc", "w", 0)


def test_ppswor_unquantized_weight_fails_loudly(spark):
    """ADVICE-r8: one un-quantized huge weight must raise in-plan
    (USER_RAISED_EXCEPTION naming the cap), never silently build a
    100M-long ticket array in a single row and OOM the executor; a
    weight AT the cap still samples."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    big = spark.createDataFrame(
        [(1, 10), (2, sampling.PPSWOR_MAX_WEIGHT + 1)], "doc LONG, w LONG"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e:
        sampling.ppswor_bottom_k(big, "doc", "w", 5).collect()
    assert "quantize" in str(e.value)
    at_cap = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc LONG, w LONG"
    )
    assert len(sampling.ppswor_bottom_k(at_cap, "doc", "w", 5).collect()) == 2


def test_ppswor_duplicate_keys_mass_adds(spark):
    """Duplicate key rows are ONE population unit with summed weight —
    the sample can never contain the same key twice, and the summed
    row matches the model of a single pre-summed row."""
    dup = [(7, 2), (7, 3), (8, 1), (9, None), (9, 4)]
    df = spark.createDataFrame(dup, "doc LONG, w LONG")
    out = sampling.ppswor_bottom_k(df, "doc", "w", k=10).collect()
    got = {r.key: r.weight for r in out}
    assert got == {7: 5, 8: 1, 9: 4}          # summed; NULL row adds nothing
    assert len(out) == len(got)               # no key twice
    merged = spark.createDataFrame([(7, 5), (8, 1), (9, 4)], "doc LONG, w LONG")
    want = [
        (r.key, r.weight, r.ticket, r.rank)
        for r in sampling.ppswor_bottom_k(merged, "doc", "w", 10)
        .orderBy("rank").collect()
    ]
    assert [(r.key, r.weight, r.ticket, r.rank)
            for r in sorted(out, key=lambda r: r.rank)] == want


def test_ppswor_weight_proportional_odds(spark):
    """A weight-9 key should be sampled ~9x as often as a weight-1 key
    across independent salts (pairwise odds w_a/(w_a+w_b) = 0.9)."""
    rows = [(0, 9), (1, 1)]
    df = spark.createDataFrame(rows, "doc LONG, w LONG")
    wins = 0
    n = 60
    for s in range(n):
        top = sampling.ppswor_bottom_k(df, "doc", "w", 1, salt=f"odds{s}").collect()
        wins += top[0].key == 0
    # Binomial(60, 0.9): P(wins < 44) < 1e-4
    assert wins >= 44


# ---------------------------------------------------------------------------
# perceptual scene cuts
# ---------------------------------------------------------------------------


def _frame_dhash(frame: bytes) -> int:
    # mirrors decode_media's slice-mean fake decode at 8x9 on a full
    # 72-byte frame (one byte per pixel) + dhash64's bit rule
    assert len(frame) == 72
    h = 0
    for r in range(8):
        for c in range(8):
            if frame[r * 9 + c + 1] > frame[r * 9 + c]:
                h |= 1 << (r * 8 + c)
    return h


def _scene_model(text: str):
    # shot synthesis mirror: every 9-char window is a 3-frame shot,
    # frame payload = the window's 8 cyclic rotations (72 bytes when
    # full-width) — rows differ, hash words decouple
    import math

    windows = [text[9 * i : 9 * i + 9] for i in range(math.ceil(len(text) / 9))]
    frames = [
        "".join(w[r:] + w[:r] for r in range(8)) for w in windows for _ in range(3)
    ]
    assert all(len(f) == 72 for f in frames)
    hashes = [_frame_dhash(f.encode()) for f in frames]
    cuts = [
        1 if i == 0 or bin(hashes[i] ^ hashes[i - 1]).count("1") >= 12 else 0
        for i in range(len(hashes))
    ]
    lens, cur = [], 0
    for c in cuts:
        if c and cur:
            lens.append(cur)
            cur = 0
        cur += 1
    lens.append(cur)
    return len(frames), len(lens), max(lens)


def test_scene_cuts_match_model_on_planted_clip(spark):
    """A clip built from 9-char shots — three repeats of a calm
    window (a long 9-frame scene: identical windows merge), one hard
    content change, then a near-identical window (a slow pan that
    must NOT cut) — segments exactly as the pure-Python model says."""
    from proglog_spark.queries import REGISTRY

    calm = "ABCABCABC"
    loud = "zrjqxwvut"
    pan = "rrjqxwvut"  # one char off loud: 7 bits — sub-threshold, merges
    text = calm * 3 + loud + pan
    model = _scene_model(text)
    rows = [(7, text, "s", len(text))]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING, n_chars LONG")
    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(f"{td}/documents.parquet")
        out = REGISTRY["docs_video_scene_cuts"][0](spark, td).collect()
        kf = REGISTRY["docs_scene_keyframes"][0](spark, td).collect()
    assert [(r.n_frames, r.n_scenes, r.longest_scene) for r in out] == [model]
    # sanity: 15 frames, the calm run merged (scene of 9), pan merged
    assert model == (15, 2, 9)
    # keyframes: scene 1 = frames 0-8 (middle 4), scene 2 = frames
    # 9-14 (middle 11) — mid-scene, never the cut-boundary frame
    assert [(r.scene_id, r.start_k, r.scene_len, r.keyframe_k) for r in kf] == [
        (1, 0, 9, 4),
        (2, 9, 6, 11),
    ]


def test_scene_threshold_sweep_matches_model(spark):
    """scene_count_sweep vs the pure-Python model on the planted clip,
    across thresholds that straddle the fixture's distance spectrum
    (the pan pair sits at 7 bits: threshold 4 must cut it, 12 must
    merge it), plus the first-frame-is-always-a-cut rule."""
    import math

    from proglog_spark.multimodal.frameindex import scene_count_sweep

    calm = "ABCABCABC"
    text = calm * 3 + "zrjqxwvut" + "rrjqxwvut"
    windows = [text[9 * i : 9 * i + 9] for i in range(math.ceil(len(text) / 9))]
    frames = [
        "".join(w[r:] + w[:r] for r in range(8)) for w in windows for _ in range(3)
    ]
    hashes = [_frame_dhash(f.encode()) for f in frames]
    rows = [
        (7, k, h & 0xFFFF_FFFF, h >> 32) for k, h in enumerate(hashes)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, k LONG, simhash_lo LONG, simhash_hi LONG"
    )
    thresholds = [4, 12, 40]
    got = [
        (r.threshold, r.n_scenes, r.n_frames, r.mean_scene_len_micro)
        for r in scene_count_sweep(df, thresholds).collect()
    ]
    want = []
    for t in sorted(thresholds):
        cuts = sum(
            1
            for i in range(len(hashes))
            if i == 0
            or bin(hashes[i] ^ hashes[i - 1]).count("1") >= t
        )
        want.append(
            (t, cuts, len(hashes), 1_000_000 * len(hashes) // cuts)
        )
    assert got == want
    # the spectrum really straddles: 4 cuts the 7-bit pan, 12 merges
    # it, 40 merges everything but the hard change + first frame
    by_t = {t: n for t, n, _, _ in got}
    assert by_t[4] > by_t[12] > 1 and by_t[40] == 2


def test_scene_cuts_from_index_matches_direct_path(spark):
    """The persisted-fingerprint path must agree with the direct
    decode path row-for-row (same planted clip as the model test),
    and the frozen artifact must carry ONLY the 4-long fingerprint
    schema — never a payload column."""
    from proglog_spark.multimodal.frameindex import (
        FRAME_FINGERPRINT_SCHEMA,
        frame_fingerprint_read,
    )
    from proglog_spark.queries import REGISTRY

    calm = "ABCABCABC"
    text = calm * 3 + "zrjqxwvut" + "rrjqxwvut"
    rows = [(7, text, "s", len(text))]
    d = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING, n_chars LONG"
    )
    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(f"{td}/documents.parquet")
        direct = REGISTRY["docs_video_scene_cuts"][0](spark, td).collect()
        frozen = REGISTRY["docs_scene_cuts_from_index"][0](spark, td).collect()
    assert [tuple(r) for r in frozen] == [tuple(r) for r in direct]

    # artifact schema contract: write+read round-trips the fingerprint
    # table exactly, clip-clustered
    sk = spark.createDataFrame(
        [(1, 0, 5, 9), (1, 1, 5, 9), (2, 0, 7, 7)],
        FRAME_FINGERPRINT_SCHEMA,
    )
    from proglog_spark.multimodal.frameindex import frame_fingerprint_write

    with tempfile.TemporaryDirectory() as td:
        frame_fingerprint_write(sk, f"{td}/fp")
        back = frame_fingerprint_read(spark, f"{td}/fp")
        assert [f.name for f in back.schema.fields] == [
            "doc_id", "k", "simhash_lo", "simhash_hi",
        ]
        assert sorted(tuple(r) for r in back.collect()) == [
            (1, 0, 5, 9), (1, 1, 5, 9), (2, 0, 7, 7),
        ]


def test_shared_scenes_match_planted_splice(spark):
    """Cross-clip shared-scene retrieval on a planted splice: clips 1
    and 2 both contain the same 9-frame calm scene (calm*3) spliced
    between DIFFERENT surroundings; clip 3 shares nothing. Expected
    output is exactly one pair row — (1, 2) sharing that one scene —
    because the surrounding scenes are sub-min_len (3 frames) or
    content-distinct, and containment is 10^6 * 1/min(1, 1). Also
    pins the negative: the promiscuity regime (every clip pairing
    with every other on single-shot scenes) must NOT reappear."""
    from proglog_spark.queries import REGISTRY

    calm = "ABCABCABC"
    loud = "zrjqxwvut"
    rows = [
        (1, calm * 3 + loud, "s", 36),          # calm scene, loud tail
        (2, loud + calm * 3, "s", 36),          # loud head, SAME calm scene
        (3, "qqqppprrr" * 4, "s", 36),          # unrelated clip
    ]
    d = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING, n_chars LONG"
    )
    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(f"{td}/documents.parquet")
        got = [
            tuple(r)
            for r in REGISTRY["docs_video_shared_scenes"][0](
                spark, td
            ).collect()
        ]
    # clip 1: scenes are calm (9 frames, kept) + loud (3, dropped);
    # clip 2: loud (3, dropped) + calm (9, kept) — identical ordered
    # frame-hash sequence, so the signatures collide; clip 3's one
    # 12-frame scene has a different sequence and pairs with nobody
    assert got == [(1, 2, 1, 1, 1, 1_000_000)]


def test_av_dedup_verdicts_classify_planted_pairs(spark):
    """Cross-modality verdict report on planted clips covering all
    three classes. Clips 1 and 2 are byte-identical (same calm scene,
    same soundtrack -> confirmed, hamming 0). Clip 3 contains the SAME
    27-char calm scene spliced after a different head whose per-frame
    energies run in the OPPOSITE phase (aaa~~~ vs ~~~aaa groups), so
    the scene tier matches but the audio tier reads hamming 8 -> the
    re_dubbed pair the gate exists to surface. Clips 4 and 5 share no
    9-char window (different frame hashes, no shared scene) but clip 5
    permutes characters WITHIN each 3-char energy frame — energy is a
    sum of squares, so the audio fingerprints are IDENTICAL ->
    audio_only. Every cross-group pair sits at hamming >= 8, outside
    the radius-3 rule, so exactly four report rows exist. The expected
    hamming values are the pure-Python mirror of the energy-hash rule
    (tests/test_multimodal.py test_audio_ahash64_bit_rule_and_nulls)."""
    from proglog_spark.queries import REGISTRY

    calm = "ABCABCABC"
    t1 = calm * 3 + "~~~aaa" * 9
    t3 = "aaa~~~" * 9 + calm * 3
    t4 = "defrstuvw" * 6
    t5 = "".join(
        t4[i + 1] + t4[i] + t4[i + 2] for i in range(0, len(t4), 3)
    )
    rows = [
        (1, t1, "s", len(t1)),
        (2, t1, "s", len(t1)),
        (3, t3, "s", len(t3)),
        (4, t4, "s", len(t4)),
        (5, t5, "s", len(t5)),
    ]
    d = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING, n_chars LONG"
    )
    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(f"{td}/documents.parquet")
        got = [
            tuple(r)
            for r in REGISTRY["docs_av_dedup_verdicts"][0](
                spark, td
            ).collect()
        ]
    assert got == [
        (1, 2, 1, 0, "confirmed"),
        (1, 3, 1, 8, "re_dubbed"),
        (2, 3, 1, 8, "re_dubbed"),
        (4, 5, 0, 0, "audio_only"),
    ]
