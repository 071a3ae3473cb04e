"""Round-end preflight gate (VERDICT r4 item 3).

Round 4 shipped while ``pytest`` was red — that state was visible only
in the judge's verdict, not in the repo.  This tool makes it
un-ignorable: it runs the FULL test suite plus the local replica of the
driver's oracle gate over every registry entry, and writes the combined
result to ``PREFLIGHT.json`` at the repo root, which gets committed at
round end.  A red preflight in git history is a loud artifact.

    python tools/preflight.py            # full: pytest + all oracles
    python tools/preflight.py --no-pytest  # oracle gate only

Exit status is nonzero if anything is red, so it can gate scripts.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
sys.path.insert(0, REPO)  # the registry import in the plan-audit check


def run_pytest() -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = (proc.stdout or "").strip().splitlines()[-1:] or [""]
    m = re.search(r"(\d+) passed", tail[0])
    f = re.search(r"(\d+) failed", tail[0])
    s = re.search(r"(\d+) skipped", tail[0])
    return {
        "green": proc.returncode == 0,
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else 0,
        "skipped": int(s.group(1)) if s else 0,
        "summary_line": tail[0],
        "sec": round(time.time() - t0, 1),
    }


def run_oracles() -> dict:
    """Invoke check_oracle.py as a subprocess (it owns a SparkSession)."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), SF_DIR],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    # check_oracle prints one status line per query; progress bars embed
    # carriage returns, so split on both.
    lines = re.split(r"[\r\n]+", proc.stdout or "")
    status: dict[str, str] = {}
    for ln in lines:
        m = re.search(r"\b([a-z][a-z_0-9]+): (OK|FAIL|SPARK ERROR|rows-only)", ln)
        if m:
            status[m.group(1)] = m.group(2)
    n_fail = sum(1 for v in status.values() if v in ("FAIL", "SPARK ERROR"))
    return {
        "green": proc.returncode == 0 and n_fail == 0,
        "checked": len(status),
        "failed": n_fail,
        "failures": {k: v for k, v in status.items() if v in ("FAIL", "SPARK ERROR")},
        "rows_only": sorted(k for k, v in status.items() if v == "rows-only"),
        "sf_dir": SF_DIR,
        "sec": round(time.time() - t0, 1),
    }


def probe_transform_with_state() -> dict:
    """Record the transformWithStateInPandas environment boundary
    (VERDICT r6 item 7 / r7 item 5) as a PREFLIGHT field instead of
    only a pytest skip line: Spark 4's TWS Python state server needs
    ``protobuf``, which this sandbox does not ship, so the engine pins
    the ``applyInPandasWithState`` form (streaming/stateful.py).  The
    probe is the exact importability condition the skipping test
    (tests/test_streaming.py::test_transform_with_state_env_probe)
    gates on — the moment the environment gains protobuf, both light
    up together."""
    try:
        import google.protobuf  # noqa: F401

        return {
            "available": True,
            "reason": "protobuf importable; the TWS pytest probe runs a real "
            "transformWithStateInPandas query",
        }
    except ImportError:
        return {
            "available": False,
            "reason": "transformWithStateInPandas state server needs protobuf, "
            "absent in this sandbox; operator semantics expressed via "
            "applyInPandasWithState (streaming/stateful.py)",
        }


def check_plan_audit_coverage() -> dict:
    """PLAN_AUDIT.json must cover the CURRENT registry (VERDICT r12
    item 2): the r12 artifact was generated at 223 queries just before
    a registry restore brought it back to 225, so two queries shipped
    with no current audit row — the same silent-shrink class the
    driver-style load probe catches for registrations.  A stale or
    short audit is a red preflight; regenerate with
    ``python tools/plan_audit.py``."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    expected = len(all_queries())
    try:
        with open(os.path.join(REPO, "PLAN_AUDIT.json")) as f:
            audit = json.load(f)
        audited = set(audit.get("queries", {}))
    except (FileNotFoundError, json.JSONDecodeError):
        audited = set()
    missing = sorted(set(all_queries()) - audited)
    return {
        "green": not missing and len(audited) == expected,
        "registry_queries": expected,
        "audited_queries": len(audited),
        "missing_from_audit": missing[:20],
        "stale_in_audit": sorted(audited - set(all_queries()))[:20],
    }


def main() -> None:
    out: dict = {"ts_note": "written by tools/preflight.py at round end"}
    out["transform_with_state"] = probe_transform_with_state()
    out["plan_audit_coverage"] = check_plan_audit_coverage()
    pac = out["plan_audit_coverage"]
    print(
        f"plan-audit coverage: {'GREEN' if pac['green'] else 'RED'} "
        f"({pac['audited_queries']}/{pac['registry_queries']} audited)"
    )
    if "--no-pytest" not in sys.argv:
        out["pytest"] = run_pytest()
        print(f"pytest: {'GREEN' if out['pytest']['green'] else 'RED'} "
              f"({out['pytest']['summary_line']})")
    out["oracle"] = run_oracles()
    print(f"oracle gate: {'GREEN' if out['oracle']['green'] else 'RED'} "
          f"({out['oracle']['checked']} checked, {out['oracle']['failed']} failed)")
    out["green"] = all(
        v["green"] for v in out.values() if isinstance(v, dict) and "green" in v
    )
    # Regenerate the registry index so QUERIES.md can never drift from
    # the code (VERDICT r6 item 8); a generator failure is a red flag
    # but must not mask the test/oracle result.
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_queries_md.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    out["queries_md"] = {
        "green": gen.returncode == 0,
        "note": (gen.stdout or gen.stderr).strip()[-200:],
    }
    print(f"QUERIES.md: {'regenerated' if gen.returncode == 0 else 'FAILED'}")
    with open(os.path.join(REPO, "PREFLIGHT.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"PREFLIGHT.json written — overall {'GREEN' if out['green'] else 'RED'}")
    sys.exit(0 if out["green"] else 1)


if __name__ == "__main__":
    main()
