#!/usr/bin/env python3
"""Memory-pressure arm of the bench A/B rig (SURVEY §6.0, ROUND15 §2).

Holds a GiB-sized anonymous resident set (mmap) and rewrites it forever
in 64 MiB blocks (memcpy speed), so the host must reclaim page cache /
fault pages while the bench runs — the r13/r14 driver-environment
shape. Marks itself maximally OOM-eligible so a kill lands here, never
on the bench JVM.

Usage: fault.py [gib=15] [seconds=600]
"""
import mmap, sys, time

gib = int(sys.argv[1]) if len(sys.argv) > 1 else 15
secs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
try:
    open('/proc/self/oom_score_adj', 'w').write('1000')
except OSError:
    pass
n = gib * (1 << 30)
m = mmap.mmap(-1, n)
block = bytes(range(256)) * (64 * (1 << 20) // 256)  # 64 MiB
deadline = time.time() + secs
while time.time() < deadline:
    for off in range(0, n - len(block), len(block)):
        m.seek(off)
        m.write(block)
        if time.time() > deadline:
            break
