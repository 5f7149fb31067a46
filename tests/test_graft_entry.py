"""The driver contract: entry() compiles single-chip, dryrun_multichip runs
the full distributed step on a virtual mesh."""

import jax


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out[1]) > 0


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, len(jax.devices())))
