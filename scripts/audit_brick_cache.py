"""Oracle study for a cached-row flat engine (the brick-cache lever).

Successive sphere-trace rounds re-probe the brick the previous march
segment stopped in (convergence rounds land just before the surface they
found), so the flat engine re-gathers rows it fetched one application
earlier. A hypothetical engine that carries the last gathered row per lane
and retires cached-brick sphere rounds without a new gather has a per-lane
application floor of the FRESH-probe count (march.APPS_FRESH).

This script runs the paid-vs-useful audit (scripts/audit_apps.py) twice —
production counting, then fresh-only counting — at the same config. Each
run band-sorts by its own cost signal (exactly what the real engine would
do), so the paid ratios compare like for like. The fresh/total USEFUL
ratio bounds the gather-volume cut; the fresh/total PAID ratio bounds the
frame-time cut of the dominant phases (frame time tracks paid apps,
PERFORMANCE.md round-3 audit).

Usage: python scripts/audit_brick_cache.py [--size 512] [--vres 256]
"""

import sys

sys.path.insert(0, ".")

from raymarchcl_tpu.ops import march

import audit_apps


def main():
    print("=== production counting (every application) ===", flush=True)
    march.APPS_FRESH = False
    audit_apps.main()
    print("=== fresh-brick counting (cached-row oracle) ===", flush=True)
    march.APPS_FRESH = True
    audit_apps.main()
    march.APPS_FRESH = False


if __name__ == "__main__":
    main()
