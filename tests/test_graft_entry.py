"""Driver entry points compile and run on the virtual CPU mesh."""

import jax
import pytest

import __graft_entry__ as ge


def test_entry_compiles():
    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
