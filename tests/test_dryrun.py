"""The driver's multichip dry run must stay inside its wall clock.

Round 4 shipped a dryrun_multichip that was semantically right but
cost ~8x the driver's timeout (MULTICHIP_r04 rc=124); this guard runs
the REAL entry point on the suite's 8-virtual-device CPU mesh so a
cost regression fails loudly here instead of silently in the driver
(VERDICT r4 #1).  The 300 s budget assertion lives inside
dryrun_multichip itself.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_completes():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
