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
