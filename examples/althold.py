#!/usr/bin/env python3
"""Drop the vehicle and test altitude hold — the counterpart of the
reference's attic/examples/althold.py, which is a thin shim over the
pidctrl runner (attic/examples/althold.py:10-12)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.abspath(__file__)))

from pidctrl import main

if __name__ == '__main__':
    main()
