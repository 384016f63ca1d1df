"""Shared hypothesis example budget for the fuzz/property suites.

Default budgets keep the suite ~1 min. Setting RAPTOR_SPARK_FUZZ_X=N
multiplies every fuzz test's max_examples by N for deep sweeps
(e.g. ``RAPTOR_SPARK_FUZZ_X=25 pytest tests/test_turtle_fastpath.py
tests/test_parser_robustness.py tests/test_serialize_property.py
tests/test_format_guess.py``), mirroring how the reference's libFuzzer
harness (tests/fuzz/fuzz_parser.c) runs unbounded out-of-band while CI
stays fast."""

import os

_X = max(1, int(os.environ.get("RAPTOR_SPARK_FUZZ_X", "1")))


def budget(n: int) -> int:
    return n * _X
