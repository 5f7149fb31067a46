"""The driver contract: entry() compiles single-chip, dryrun_multichip runs
the full distributed step on a virtual mesh."""

import jax


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out[1]) > 0


def test_dryrun_multichip(monkeypatch):
    import __graft_entry__ as g

    # the full phase set costs ~15 wall minutes on the 2-core virtual
    # mesh (1M build+solve, K-cycle, RS/pairwise); the suite run checks
    # the contract with the required phases only — the driver invokes
    # dryrun_multichip separately with the full default budget
    monkeypatch.setenv("ROCALUTION_DRYRUN_BUDGET_S", "200")
    g.dryrun_multichip(min(8, len(jax.devices())))
