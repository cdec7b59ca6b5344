"""Wall-clock context-manager timer (behavioral reference:
plb/utils/timer.py)."""
from __future__ import annotations

import time


class Timer:
    def __init__(self, name: str = "", print_on_exit: bool = True):
        self.name = name
        self.print_on_exit = print_on_exit
        self.elapsed = None

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        if self.print_on_exit:
            print(f"{self.name}: {self.elapsed:.6f}s")
        return False
