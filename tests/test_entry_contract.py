"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, multimodal plumbing produces typed metadata. (Full
Spark-vs-DuckDB parity runs via tools/check_oracle.py — kept out of
pytest so the suite stays fast.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from proglog_spark.multimodal import extract_media_meta


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["split", "source", "n_docs", "total_chars"]
    assert len(rows) > 0
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert all(r.n_docs > 0 and r.total_chars > 0 for r in rows)


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_oracle_final_columns_are_scalar(sf_dir):
    """Driver-canonicalization lint (SURVEY §2.1): the driver's hash
    harness sorts result rows with pandas ``sort_values``, where
    list/struct/map cells raise ``unhashable type`` — learned the hard
    way in round 4 when the only two array-final-column queries
    (docs_tokenize_ids, docs_bpe_token_stats) went driver-RED despite
    agreeing with their oracles. Every declared query's FINAL columns
    must therefore be scalar. DuckDB ``DESCRIBE`` binds and types the
    oracle without executing it, and the gate separately enforces
    Spark-vs-oracle schema match, so linting the oracle types covers
    the Spark side too — cheap enough to sweep all registered oracles
    in one test."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            t = typ.upper()
            if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                bad.append((name, col, typ))
    assert not bad, f"non-scalar final columns break the driver harness: {bad}"


@pytest.mark.parametrize("name", ["log_bounds", "events_extremes", "emb_dot_topk"])
def test_spot_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() > 0


def test_media_meta_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n")), (2, bytearray(b"RIFFxxxx"))],
        "doc_id LONG, payload BINARY",
    )
    out = {r.doc_id: r for r in extract_media_meta(df).collect()}
    assert out[1].n_bytes == 6 and out[1].header_hex == "89504E47"
    assert out[2].n_bytes == 8 and out[2].header_hex == "52494646"


# ---------------------------------------------------------------------------
# Driver re-check rule, mechanized (VERDICT-r5 item 1)
# ---------------------------------------------------------------------------


def _digest_tools():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import digest_manifest

    return digest_manifest


def test_driver_checked_digest_manifest():
    """Every name green-listed in _DRIVER_CHECKED must carry a digest in
    driver_check_manifest.json recorded when its check was logged, and
    that digest must match the CURRENT dependency closure (query source
    + oracle SQL + referenced proglog_spark module/helper sources).
    Drift means an implementation or oracle changed after its last
    driver check — the name must be EVICTED into _WINDOW_PRIORITY (and
    `tools/digest_manifest.py --evict`-ed) so the driver re-verifies
    it, or consciously re-recorded. This converts the re-check rule
    from builder discipline into CI."""
    dm = _digest_tools()
    drifted, missing, stale = dm.drift_report()
    assert not drifted, (
        f"digest drift for driver-checked queries {drifted}: evict them "
        "from _DRIVER_CHECKED into _WINDOW_PRIORITY and run "
        "`python tools/digest_manifest.py --evict <names>`"
    )
    assert not missing, f"checked but never digest-recorded: {missing}"
    assert not stale, (
        f"manifest entries for non-checked names {stale}: run "
        "`python tools/digest_manifest.py --evict <names>`"
    )


def test_digest_detects_oracle_and_impl_drift():
    """The digest must move when the oracle SQL, the query function, or
    a referenced helper changes — otherwise the manifest test above is
    a no-op. Exercised with an injected registry (no globals touched)."""
    dm = _digest_tools()

    def q_v1(spark, sf_dir):
        return helper_v1(spark)

    def q_v2(spark, sf_dir):
        return helper_v1(spark) + 1

    def helper_v1(spark):
        return 0

    base = dm.query_digest("q", {"q": (q_v1, "SELECT 1 AS x")})
    assert dm.query_digest("q", {"q": (q_v1, "SELECT 2 AS x")}) != base
    assert dm.query_digest("q", {"q": (q_v2, "SELECT 1 AS x")}) != base
    # same fn text + sql => same digest (stability)
    assert dm.query_digest("q", {"q": (q_v1, "SELECT 1 AS x")}) == base


def test_digest_covers_operator_modules():
    """A real registry entry's closure must reach the operator modules
    it calls through (the conservative over-evict direction): the
    minhash query's digest includes operators/dedup.py source."""
    dm = _digest_tools()
    from proglog_spark.queries import REGISTRY

    fn_srcs, mods = {}, {}
    dm._fn_closure(REGISTRY["docs_minhash_lsh"][0], fn_srcs, mods)
    assert "proglog_spark.operators.dedup" in mods


def test_digest_reports_renamed_checked_name(monkeypatch):
    """A green-listed name that no longer exists in REGISTRY (renamed/
    deleted query with a stale _DRIVER_CHECKED entry) must surface as
    an actionable drift row, not a KeyError traceback."""
    import proglog_spark.queries as Q

    dm = _digest_tools()
    monkeypatch.setattr(
        Q, "_DRIVER_CHECKED", frozenset(Q._DRIVER_CHECKED | {"ghost_query"})
    )
    drifted, _missing, _stale = dm.drift_report()
    assert "ghost_query" in drifted


def test_bench_stdout_line_stays_small():
    """The round driver tail-captures bench.py's stdout with a bounded
    buffer: the final JSON line must stay under 200 bytes even at
    worst-case field widths (the per-query map lives in
    bench_queries.json for exactly this reason). Asserts on the REAL
    builder bench.py prints through, so any future field creep fails
    here — r6 added the loadavg pair."""
    import bench

    line = bench.stdout_line(99999.9999, "0.001", 99999, [999.99, 999.99])
    assert len(line) < 200


def test_bench_canary_and_cold_families_name_real_queries():
    """Every canary / cold-family member must be a registered query —
    a rename that silently drops one from the inflation factor or the
    cold report is the 'silent cap reads as full coverage' failure."""
    import bench
    from proglog_spark.queries import REGISTRY

    assert set(bench.CANARY_QUIET_REF) == {"start", "end"}
    # both phases must pin the SAME subset (the two passes time the
    # same queries; a name present in one phase only would silently
    # drop out of that phase's median)
    assert set(bench.CANARY_QUIET_REF["start"]) == set(
        bench.CANARY_QUIET_REF["end"]
    )
    for phase, refs in bench.CANARY_QUIET_REF.items():
        for name, ref in refs.items():
            assert name in REGISTRY, f"{phase}:{name}"
            assert ref > 0, f"{phase}:{name}"
    for fam, members in bench.COLD_FAMILIES.items():
        for name in members:
            assert name in REGISTRY, f"{fam}:{name}"


def test_bench_canary_inflation_median():
    """The inflation factor is the MEDIAN of measured/pinned ratios
    vs the measured pass's OWN phase references (VERDICT-r9 #2 —
    the start pass reads ~20% high against end-of-suite numbers even
    warm, so each phase pins its own quiet-run pass), robust to a
    single outlier canary, None when nothing measured."""
    import bench

    for phase in ("start", "end"):
        refs = bench.CANARY_QUIET_REF[phase]
        names = sorted(refs)
        # all exactly at reference -> 1.0 (the "quiet machine reads
        # ~1.0 at BOTH ends" property the per-phase refs exist for)
        assert bench._canary_inflation(dict(refs), phase) == 1.0
        # one wild outlier barely moves the median
        measured = dict(refs)
        measured[names[0]] = refs[names[0]] * 100
        assert bench._canary_inflation(measured, phase) == 1.0
        # uniform 2x throttling -> 2.0
        assert bench._canary_inflation(
            {n: refs[n] * 2 for n in names}, phase
        ) == 2.0
        assert bench._canary_inflation({}, phase) is None


def test_bench_canary_spread_discriminates_structural():
    """Uniform machine load keeps the max/min ratio spread at 1.0;
    one diverging canary pushes the spread past the band and NAMES
    the outlier (VERDICT-r9 #3 — a regression in a canary query must
    not masquerade as machine load)."""
    import bench

    refs = bench.CANARY_QUIET_REF["end"]
    names = sorted(refs)
    # uniform 3x throttling: every ratio identical -> spread 1.0
    spread = bench._canary_spread({n: refs[n] * 3 for n in names}, "end")
    assert spread == (1.0, spread[1])
    # one query 2.5x, rest at reference -> spread 2.5, outlier named
    measured = dict(refs)
    measured[names[2]] = refs[names[2]] * 2.5
    spread = bench._canary_spread(measured, "end")
    assert spread == (2.5, names[2])
    assert spread[0] > bench.CANARY_SPREAD_BAND
    # one query FASTER (plan improvement / stale ref) under uniform
    # 1.2x load: the fast one is the outlier — naming the max-ratio
    # query would blame an innocent one
    measured = {n: refs[n] * 1.2 for n in names}
    measured[names[1]] = refs[names[1]] * 0.4
    spread = bench._canary_spread(measured, "end")
    assert spread == (3.0, names[1])
    # fewer than two measured -> None
    assert bench._canary_spread({names[0]: refs[names[0]]}, "end") is None
    assert bench._canary_spread({}, "end") is None


def test_bench_noisier_run_does_not_clobber():
    """A full-suite rerun whose end-pass canary reads meaningfully
    worse than the committed artifact's must divert (VERDICT-r9 #4 —
    the driver's loaded run must not replace a quiet round-close
    map); a different query surface always replaces; the guard only
    applies between SAME-CODE runs (VERDICT-r11 #3: a changed git
    revision always replaces, so a genuine regression lands)."""
    import bench

    quiet = {"n_queries": 201, "git_head": "abc1234",
             "canary": {"inflation_end": 1.06}}
    noisy = {"n_queries": 201, "git_head": "abc1234",
             "canary": {"inflation_end": 1.32}}
    assert bench._noisier_than_committed(noisy, quiet) is not None
    # VERDICT-r11 #3: the quietest-known contract is scoped to reruns
    # of the SAME code — a run of CHANGED code always replaces, even
    # when noisier (a real plan regression must land in the map), and
    # an artifact that predates the git_head field is always replaced
    changed = dict(noisy, git_head="def5678")
    assert bench._noisier_than_committed(changed, quiet) is None
    # r12: EXCEPT when the rerun is MACHINE-flagged and the committed
    # map is QUIET — the flag is the canary's own statement that the
    # delta is uniform external load, so it must not displace a quiet
    # map even across revisions (a docs-only commit changes git_head);
    # QUIET and STRUCTURAL runs of changed code still always replace
    quiet_flagged = {"n_queries": 201, "sf": "0.1", "git_head": "abc1234",
                     "canary": {"inflation_end": 1.01, "flag": "QUIET"}}
    machine_new_code = {"n_queries": 201, "sf": "0.1", "git_head": "zzz9",
                        "canary": {"inflation_end": 1.3, "flag": "MACHINE"}}
    assert bench._noisier_than_committed(machine_new_code, quiet_flagged)
    structural_new_code = dict(
        machine_new_code,
        canary={"inflation_end": 1.0, "flag": "STRUCTURAL(tpch_q1)"},
    )
    assert (
        bench._noisier_than_committed(structural_new_code, quiet_flagged)
        is None
    )
    # r12: same-code is decided by the measured-SOURCE digest when both
    # artifacts carry it — a docs-only commit moves git_head but not
    # code_rev, so the quietest-known guard still applies; a differing
    # code_rev always replaces
    prior_cr = {"n_queries": 201, "sf": "0.1", "git_head": "doc1",
                "code_rev": "c0de", "value": 300.0,
                "canary": {"inflation_end": 1.0, "flag": "QUIET"}}
    rerun_docs_moved = {"n_queries": 201, "sf": "0.1", "git_head": "doc2",
                        "code_rev": "c0de", "value": 400.0,
                        "canary": {"inflation_end": 1.1, "flag": "QUIET"}}
    assert bench._noisier_than_committed(rerun_docs_moved, prior_cr)
    rerun_code_moved = dict(rerun_docs_moved, code_rev="feed")
    assert bench._noisier_than_committed(rerun_code_moved, prior_cr) is None
    # _code_rev is deterministic and ignores non-source files
    assert bench._code_rev() == bench._code_rev()
    legacy_prior = {"n_queries": 201, "canary": {"inflation_end": 1.06}}
    assert bench._noisier_than_committed(noisy, legacy_prior) is None
    # a full run at a DIFFERENT sf (canary skipped there) must never
    # replace the canonical sf0.1 artifact, whatever its n_queries
    sf_committed = {"n_queries": 201, "sf": "0.1",
                    "canary": {"inflation_end": 1.06}}
    other_sf = {"n_queries": 201, "sf": "0.01"}
    assert bench._noisier_than_committed(other_sf, sf_committed) is not None
    assert (
        bench._noisier_than_committed(
            {"n_queries": 205, "sf": "0.01"}, sf_committed
        )
        is not None
    )
    # same sf, stale surface -> replaced as before
    assert (
        bench._noisier_than_committed(
            {"n_queries": 205, "sf": "0.1"}, sf_committed
        )
        is None
    )
    # quieter (or equal within tolerance) overwrites
    assert bench._noisier_than_committed(quiet, noisy) is None
    assert bench._noisier_than_committed(quiet, dict(quiet)) is None
    # stale surface (different n_queries) always overwrites
    assert (
        bench._noisier_than_committed(
            {"n_queries": 205, "canary": {"inflation_end": 2.0}}, quiet
        )
        is None
    )
    # no prior artifact / no canary on either side -> overwrite
    assert bench._noisier_than_committed(noisy, {}) is None
    assert (
        bench._noisier_than_committed({"n_queries": 201}, quiet) is None
    )


def test_bench_gate_until_quiet(monkeypatch):
    """The round-close gate (VERDICT-r10 #2) probes with 3 solo canary
    passes and takes the BEST pass per attempt: it proceeds on the
    first quiet attempt, retries on loud readings, and after
    exhausting retries still proceeds (the no-clobber guard diverts a
    noisy result) — the command must always produce an artifact."""
    import bench

    refs = bench.CANARY_QUIET_REF["end"]
    quiet_pass = dict(refs)  # inflation exactly 1.0
    loud_pass = {n: v * 2 for n, v in refs.items()}  # inflation 2.0

    monkeypatch.setenv("SPARK_GRAFT_BENCH_GATE", "3")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GATE_WAIT", "0")

    def fake_runner(passes):
        it = iter(passes)
        return lambda spark, sf_dir, fns: next(it)

    # quiet on the very first attempt: one probe recorded, no retry
    monkeypatch.setattr(bench, "_run_canary", fake_runner([quiet_pass] * 3))
    rec = bench._gate_until_quiet(None, "sf", {})
    assert rec["proceeded"] == "quiet"
    assert rec["probes"] == [1.0]
    assert rec["threshold"] == 1.3
    # best-of-3 within one attempt: two loud passes + one quiet pass
    # still reads quiet (a stray interrupt must not burn an attempt)
    monkeypatch.setattr(
        bench, "_run_canary", fake_runner([loud_pass, loud_pass, quiet_pass])
    )
    rec = bench._gate_until_quiet(None, "sf", {})
    assert rec["proceeded"] == "quiet"
    assert rec["probes"] == [1.0]
    # loud attempt then quiet attempt: two probes, proceeds on #2
    monkeypatch.setattr(
        bench, "_run_canary", fake_runner([loud_pass] * 3 + [quiet_pass] * 3)
    )
    rec = bench._gate_until_quiet(None, "sf", {})
    assert rec["proceeded"] == "quiet"
    assert rec["probes"] == [2.0, 1.0]
    # every attempt loud: retries exhausted, proceeds anyway
    monkeypatch.setattr(bench, "_run_canary", fake_runner([loud_pass] * 9))
    rec = bench._gate_until_quiet(None, "sf", {})
    assert rec["proceeded"] == "exhausted"
    assert rec["probes"] == [2.0, 2.0, 2.0]
    # threshold override honored
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GATE_MAX", "2.5")
    monkeypatch.setattr(bench, "_run_canary", fake_runner([loud_pass] * 3))
    rec = bench._gate_until_quiet(None, "sf", {})
    assert rec["proceeded"] == "quiet" and rec["threshold"] == 2.5
