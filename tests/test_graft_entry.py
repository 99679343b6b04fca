"""Driver-contract tests for __graft_entry__.py."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_is_jittable_abstractly():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # abstract evaluation only (full-res compile is the driver's job on TPU)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 768, 1152, 3)
