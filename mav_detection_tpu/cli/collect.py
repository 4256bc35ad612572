"""Data-collection CLI: ``python -m mav_detection_tpu.cli.collect``.

The reference's acquisition tool is itself a command line
(``/root/reference/src/airsim-control.py:618-627``); this wraps
:func:`mav_detection_tpu.sim.control.main` so collections fly from the shell —
against AirSim over RPC, or hermetically with ``--mock``.
"""
from mav_detection_tpu.sim.control import main

if __name__ == "__main__":
    main()
