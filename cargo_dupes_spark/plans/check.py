"""CI gate [O4] — threshold checks with the reference's exit-code contract.

``cmd_check`` (``dupes-core/src/cli.rs:304-374``): four thresholds (max
exact/near group counts, max exact/near token percentages), CLI value falls
back to config; every failing check prints a "Check FAILED" line; exit 1 on
any failure, 2 on operational error, 0 on pass (``cli.rs:39-49``,
``README.md:230-233``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import PipelineConfig

EXIT_PASS = 0
EXIT_FAILED = 1
EXIT_ERROR = 2


@dataclass
class CheckResult:
    passed: bool
    failures: list[str]

    @property
    def exit_code(self) -> int:
        return EXIT_PASS if self.passed else EXIT_FAILED


def run_check(
    stats: DataFrame,
    cfg: PipelineConfig,
    max_exact_groups: int | None = None,
    max_near_groups: int | None = None,
    max_exact_percent: float | None = None,
    max_near_percent: float | None = None,
) -> CheckResult:
    """Explicit args override config values (cli.rs:311-314)."""
    s = stats.collect()[0].asDict()
    checks = [
        (
            "exact group count",
            s["exact_groups"],
            max_exact_groups if max_exact_groups is not None else cfg.max_exact_groups,
        ),
        (
            "near group count",
            s["near_groups"],
            max_near_groups if max_near_groups is not None else cfg.max_near_groups,
        ),
        (
            "exact token percent",
            s["exact_token_percent"],
            max_exact_percent if max_exact_percent is not None else cfg.max_exact_percent,
        ),
        (
            "near token percent",
            s["near_token_percent"],
            max_near_percent if max_near_percent is not None else cfg.max_near_percent,
        ),
    ]
    failures = [
        f"Check FAILED: {name} {value} exceeds threshold {limit}"
        for name, value, limit in checks
        if limit is not None and value > limit
    ]
    return CheckResult(passed=not failures, failures=failures)
