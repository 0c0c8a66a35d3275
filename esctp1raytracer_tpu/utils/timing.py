"""Wall-clock timers mirroring the reference's stderr timing block.

Reference: src/main.cpp:569-579 (BVH build timer) and :583,645-654 (render
timer) print "Threaded/Flattened/ISPC" + "Duration: <ms>" to stderr. Timer
reproduces that reporting; block_until_ready is the honest device-side
equivalent of the reference's synchronous CPU timing.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field


@dataclass
class Timer:
    name: str = "render"
    fields: dict = field(default_factory=dict)
    _start: float = 0.0
    elapsed_ms: float = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed_ms = (time.perf_counter() - self._start) * 1e3

    def report(self, file=None) -> None:
        # Same shape as the reference's stderr block (src/main.cpp:645-654).
        # file resolved at call time so redirected stderr is honored.
        if file is None:
            file = sys.stderr
        print("", file=file)
        for key, value in self.fields.items():
            print(f" {key:<10}: {value}", file=file)
        print(f"\n Duration  : {self.elapsed_ms:.3f} ms", file=file)
