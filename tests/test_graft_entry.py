"""The driver's multi-chip gate: ``__graft_entry__.dryrun_multichip(n)``.

Round 1 failed this gate because the entry asserted on the ambient device
count instead of provisioning a virtual CPU mesh itself (MULTICHIP_r01.json
ok=false). Now it self-provisions; this test runs it exactly as the driver
does — a plain function call, no env preconditions beyond what conftest sets.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_multichip_8_in_process():
    # conftest already initialized the CPU backend with 8 virtual devices, so
    # this exercises the "backend already up, enough devices" path end-to-end
    # (full sharded train step on a 4x2 data x model mesh).
    graft.dryrun_multichip(8)


def test_provision_devices_reports_current_capacity():
    assert graft._provision_devices(8) is True
    assert graft._provision_devices(10_000) is False
