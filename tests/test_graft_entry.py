"""Driver contract: __graft_entry__ compiles and the multi-chip dry run
executes on the virtual 8-device CPU mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
