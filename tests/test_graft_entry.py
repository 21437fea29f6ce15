"""Driver contract: entry() compiles single-chip; dryrun_multichip runs
on the virtual 8-device CPU mesh."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
