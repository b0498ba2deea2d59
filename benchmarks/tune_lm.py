"""A/B: second-order (Levenberg-Marquardt) matrix stages + moment init.

r4 VERDICT #1: the rigid+affine stages are ~75% of the 0.268 s cascade at
229 first-order Adam steps for <= 12 parameters. Variants measured against
bench.RECIPE on BOTH quality gates (benchmarks/_ab.py).

Run: python benchmarks/tune_lm.py
"""
from __future__ import annotations

from _ab import make_harness


def main():
    run = make_harness()
    run("baseline (adam matrix)", {})
    run("lm 24/16 pat3", dict(
        matrix_optimizer="lm", rigid_epochs=24, affine_epochs=16,
        matrix_patience=3, matrix_stop_rel=1e-3,
    ))
    run("lm 24/16 pat3 + moment", dict(
        matrix_optimizer="lm", rigid_epochs=24, affine_epochs=16,
        matrix_patience=3, matrix_stop_rel=1e-3, moment_init=True,
    ))
    run("lm 40/30 pat5", dict(
        matrix_optimizer="lm", rigid_epochs=40, affine_epochs=30,
        matrix_patience=5, matrix_stop_rel=1e-4,
    ))
    run("adam + moment", dict(moment_init=True))


if __name__ == "__main__":
    main()
