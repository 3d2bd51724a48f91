"""Round-trip and generator-parity tests for the .vlp writer and the
Python example generators (the prob2vlp.m front-end equivalents)."""

import numpy as np
import pytest

from bensolve_tpu import examples
from bensolve_tpu.vlp.reader import read_vlp
from bensolve_tpu.vlp.writer import write_vlp


def assert_same_problem(a, b):
    np.testing.assert_allclose(a.A, b.A)
    np.testing.assert_allclose(a.P, b.P)
    np.testing.assert_allclose(a.rows.lb, b.rows.lb)
    np.testing.assert_allclose(a.rows.ub, b.rows.ub)
    np.testing.assert_allclose(a.cols.lb, b.cols.lb)
    np.testing.assert_allclose(a.cols.ub, b.cols.ub)
    assert a.optdir == b.optdir
    assert a.cone_gen == b.cone_gen
    if a.gen is not None or b.gen is not None:
        np.testing.assert_allclose(a.gen, b.gen)


@pytest.mark.parametrize("ex", ["ex01", "ex02", "ex03", "ex04", "ex05",
                                "ex06", "ex08", "ex10", "ex11"])
def test_roundtrip(ex, tmp_path):
    orig = read_vlp(f"/root/reference/ex/{ex}.vlp")
    p = str(tmp_path / "out.vlp")
    write_vlp(orig, p)
    again = read_vlp(p)
    assert_same_problem(orig, again)


@pytest.mark.parametrize("name,ex", [
    ("example01", "ex01"), ("example02", "ex02"), ("example03", "ex03"),
    ("example04", "ex04"), ("example05", "ex05"), ("example06", "ex06"),
    ("example08", "ex08"), ("example10", "ex10"), ("example11", "ex11"),
])
def test_generators_match_shipped_files(name, ex):
    gen = examples.ALL[name]()
    shipped = read_vlp(f"/root/reference/ex/{ex}.vlp")
    assert_same_problem(gen, shipped)
