"""Exact work accounting (utils/accounting.py) vs hand-counted cycles."""
import numpy as np
import pytest

from sparsh_amg_tpu.models.poisson import poisson2d
from sparsh_amg_tpu.params import AMGParams
from sparsh_amg_tpu.setup.hierarchy import amg_setup
from sparsh_amg_tpu.solve.device import to_device
from sparsh_amg_tpu.utils.accounting import (work_per_iteration,
                                             _count_cycle, op_bytes)


def _mk(params, n=24):
    A = poisson2d(n)
    hier = amg_setup(A, params)
    dev = to_device(hier, params)
    return hier, dev


def test_vcycle_counts_chebyshev():
    params = AMGParams(smoother="chebyshev", cycle="V", cheby_degree=2)
    acc = [{"A": 0.0, "T": 0.0, "C": 0.0} for _ in range(3)]
    _count_cycle(3, 0, "V", params, acc)
    # per non-coarsest level: pre (deg 2) + residual + post (deg 2) = 5
    assert acc[0] == {"A": 5.0, "T": 2.0, "C": 0.0}
    assert acc[1] == {"A": 5.0, "T": 2.0, "C": 0.0}
    assert acc[2] == {"A": 0.0, "T": 0.0, "C": 1.0}


def test_wcycle_doubles_lower_levels():
    params = AMGParams(smoother="jacobi", cycle="W", nu1=1, nu2=1)
    acc = [{"A": 0.0, "T": 0.0, "C": 0.0} for _ in range(4)]
    _count_cycle(4, 0, "W", params, acc)
    # level l visited 2^l times; each visit: nu1 + residual + nu2 = 3
    assert [c["A"] for c in acc] == [3.0, 6.0, 12.0, 0.0]
    assert acc[3]["C"] == 8.0


def test_fcycle_visits():
    params = AMGParams(smoother="jacobi", cycle="F", nu1=1, nu2=1)
    acc = [{"A": 0.0, "T": 0.0, "C": 0.0} for _ in range(4)]
    _count_cycle(4, 0, "F", params, acc)
    # classical F-cycle visits level l exactly l+1 times
    assert [c["T"] for c in acc] == [2.0, 4.0, 6.0, 0.0]


def test_work_model_two_level_exact():
    # force exactly 2 levels: coarse solve is a dense inverse
    params = AMGParams(smoother="jacobi", cycle="V", nu1=1, nu2=1,
                       max_levels=2, coarse_inv_max=100000)
    hier, dev = _mk(params, n=48)
    assert hier.n_levels == 2
    w = work_per_iteration(hier, dev, params, method="cg")
    fine = hier.levels[0].A.nnz
    p = hier.levels[0].P.nnz
    nc = hier.levels[1].A.shape[0]
    # CG: 1 fine matvec + cycle(3 fine A + P + R + coarse inverse)
    expect = fine + (3 * fine + 2 * p + nc * nc)
    assert w.nnz_per_iter == pytest.approx(expect)
    assert w.spmv_equiv == pytest.approx(expect / fine)
    # refinement pass: two fine passes
    assert w.nnz_per_refine_pass == 2 * fine
    assert w.effective_nnz(10, 2) == pytest.approx(
        10 * expect + 4 * fine)


def test_bytes_positive_and_layout_aware():
    params = AMGParams(smoother="chebyshev", cycle="V")
    hier, dev = _mk(params, n=32)
    w = work_per_iteration(hier, dev, params)
    assert w.bytes_per_iter > 0
    # bytes >= 4 B per touched nonzero is a sanity floor for fp32-ish
    # layouts (band padding only adds)
    for lev in dev.levels:
        assert op_bytes(lev.A) > 0


def test_bicgstab_doubles_top_level_work():
    params = AMGParams(smoother="chebyshev", cycle="V")
    hier, dev = _mk(params, n=24)
    cg = work_per_iteration(hier, dev, params, method="cg")
    bi = work_per_iteration(hier, dev, params, method="bicgstab")
    assert bi.nnz_per_iter == pytest.approx(
        2 * cg.nnz_per_iter, rel=1e-12)


def test_footprint_table_sums_to_device_bytes():
    """Per-level footprint rows (VERDICT r2 #5) cover every persistent
    device array: their sum equals the solver's device_bytes()."""
    import numpy as np
    from sparsh_amg_tpu.models.poisson import poisson3d
    from sparsh_amg_tpu.params import KrylovParams
    from sparsh_amg_tpu.solve.solver import AMGSolver
    from sparsh_amg_tpu.utils.accounting import footprint_table

    params = AMGParams(smoother="chebyshev", cycle="V")
    s = AMGSolver(poisson3d(16), params, KrylovParams())
    rows = footprint_table(s.device, s.A_df)
    assert rows[-1]["level"] == "df64_fine"
    total = sum(r["total"] for r in rows)
    assert total == s.device_bytes()
    for r in rows:
        assert r["total"] >= 0
        assert r["total"] == (r["A"] + r["P"] + r["R"] + r["vectors"]
                              + r["coarse_inv"] + r["tri"])
