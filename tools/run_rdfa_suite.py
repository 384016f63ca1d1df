"""Dev runner for the reference's rdfa/rdfa11 conformance suites.

Usage: python tools/run_rdfa_suite.py [rdfa|rdfa11] [test ...]
Prints per-test FAIL lines (unexpected only unless tests are named) and a
summary vs the reference's EXPECTED_FAILURES.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfa as RA
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars

BASE = "http://rdfa.info/test-suite/test-cases/xhtml1/rdfa1.0/"


def run_suite(suite: str, only=()):
    version = 10 if suite == "rdfa" else 11
    v = makefile_vars(suite)
    tests = v["TEST_FILES"]
    xfail = {t.strip('"') for t in v.get("EXPECTED_FAILURES", [])}
    unexpected = []
    xpass = []
    for f in tests:
        if only and f not in only:
            continue
        data = (REF_TESTS / suite / f).read_bytes()
        base_uri = BASE + f
        triples, errs = RA.parse_document(data, base_uri=base_uri, version=version)
        with open(REF_TESTS / suite / (f[:-4] + ".out"), encoding="utf-8",
                  newline="") as fh:
            gold, gerrs = NT.parse_document(fh.read())
        assert not gerrs, (f, gerrs)
        ok = not errs and graphs_isomorphic(triples, gold)
        if ok and f in xfail:
            xpass.append(f)
        elif not ok and f not in xfail:
            unexpected.append(f)
            if only or len(unexpected) <= 40:
                msg = errs[0]["message"] if errs else (
                    "got %d want %d triples" % (len(triples), len(gold))
                )
                print(f"FAIL {suite}/{f}: {msg}")
                if only:
                    print(" GOT:")
                    for t in sorted(triples):
                        print("   ", t)
                    print(" WANT:")
                    for t in sorted(gold):
                        print("   ", t)
    total = len(only) if only else len(tests)
    print(
        f"{suite}: {total - len(unexpected)} ok, {len(unexpected)} unexpected "
        f"fails, {len(xpass)} xpass (of {len(xfail)} reference xfails)"
    )
    return unexpected


def main():
    args = sys.argv[1:]
    suites = []
    if args and args[0] in ("rdfa", "rdfa11"):
        suites = [args[0]]
        only = tuple(args[1:])
    else:
        suites = ["rdfa", "rdfa11"]
        only = ()
    bad = 0
    for s in suites:
        bad += len(run_suite(s, only))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
