"""Shared CLI runner: --pdb post-mortem debugging (reference
train_3d.py:114-122 — on exception, print the traceback and drop into pdb
instead of dying)."""
from __future__ import annotations

import sys
import traceback


def run_cli(main, argv):
    """Invoke ``main(argv)`` with the reference's --pdb affordance.

    ``--pdb`` is stripped from argv before main sees it; any exception then
    opens a post-mortem pdb session on the failure frame.
    """
    use_pdb = "--pdb" in argv
    argv = [a for a in argv if a != "--pdb"]
    if not use_pdb:
        return main(argv)
    try:
        return main(argv)
    except Exception:
        import pdb

        traceback.print_exc()
        print("[pdb] entering post-mortem debugger (--pdb)", file=sys.stderr)
        pdb.post_mortem()
        raise
