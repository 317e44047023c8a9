"""Driver-hook regression guard: dryrun_multichip keeps compiling + running
as the framework evolves (the driver runs it with virtual CPU devices)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)  # exercises both the (2,1) DP and (1,2) spatial legs
