"""bench.py must always print exactly one valid JSON line with every
headline query timed (the driver records it verbatim)."""

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        # keep the committed sf0.1 BENCH_DETAIL.json out of reach
        SPARK_GRAFT_DETAIL_PATH=str(tmp_path / "bench_detail.json"),
        # the smoke validates the stdout CONTRACT, not timings: one
        # timed pass halves runtime, and the timeout carries ~5x
        # headroom over the quiet runtime (a contended box pushed the
        # 2-pass run past the old 480 s in r6)
        SPARK_GRAFT_BENCH_PASSES="1",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # snapshot the HEADLINE the subprocess will actually load: importing
    # bench at assert time races any concurrent edit to bench.py made
    # while the subprocess runs (bit us three times in active sessions)
    import ast

    src = open(os.path.join(repo, "bench.py")).read()
    tree = ast.parse(src)
    headline = None
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "HEADLINE" for t in node.targets
        ):
            headline = [ast.literal_eval(e) for e in node.value.elts]
    assert headline, "HEADLINE not found in bench.py"
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert set(payload["queries"]) == set(headline)
    assert all(v >= 0 for v in payload["queries"].values()), payload["queries"]


def test_merge_quiet_pin_parses_and_preserves_n_requested(tmp_path):
    """ADVICE r10 fixes pinned: (1) two bench JSON objects printed on
    ONE line parse correctly via raw_decode (the old greedy regex
    swallowed both; a non-greedy one would truncate the nested
    "queries" object) and the LAST is used; (2) the run's n_requested
    survives the merge instead of being overwritten by the merged pin
    size; (3) never-loosen: existing pins only tighten."""
    import json
    import subprocess
    import sys

    pin = {
        "queries": {"a": 1.0, "b": 2.0},
        "value": 3.0,
        "n_ok": 2,
        "n_requested": 99,
        "sf": 0.1,
    }
    pin_path = tmp_path / "pin.json"
    pin_path.write_text(json.dumps(pin))
    run1 = {
        "metric": "total_sec",
        "value": 9.9,
        "queries": {"a": 5.0, "b": 0.5},
        "failed": [],
        "contended": False,
        "n_requested": 3,
    }
    run2 = dict(run1, queries={"a": 0.8, "b": 3.0, "c": 4.0})
    log = tmp_path / "bench.log"
    # both objects on ONE line; the last must win
    log.write_text("noise\n" + json.dumps(run1) + " " + json.dumps(run2) + "\n")
    out = subprocess.run(
        [sys.executable, "scripts/merge_quiet_pin.py", str(log), str(pin_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    merged = json.loads(pin_path.read_text())
    assert merged["queries"] == {"a": 0.8, "b": 2.0, "c": 4.0}  # tighten/keep/add
    assert merged["n_requested"] == 3  # the run's, not len(pin)
    assert merged["n_ok"] == 3

    # contended runs must be refused
    bad = dict(run2, contended=True)
    log.write_text(json.dumps(bad) + "\n")
    out2 = subprocess.run(
        [sys.executable, "scripts/merge_quiet_pin.py", str(log), str(pin_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out2.returncode != 0
