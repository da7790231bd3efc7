"""Summarize a jax.profiler xplane.pb: per-op device time on the TPU plane.

Usage: python experiments/xplane_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    if not path.endswith(".pb"):
        cands = sorted(glob.glob(path + "/**/*.xplane.pb", recursive=True))
        path = cands[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    return xs


def main():
    xs = load(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        print(f"=== plane: {plane.name} ===")
        ev_names = dict(plane.event_metadata)
        tot = collections.Counter()
        cnt = collections.Counter()
        line_total = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                dur = ev.duration_ps / 1e6  # ps -> us
                tot[name] += dur
                cnt[name] += 1
                line_total[line.name] += dur
        print("-- per line (us):")
        for ln, us in line_total.most_common(10):
            print(f"  {us:12.1f}  {ln}")
        print(f"-- top {top_n} ops by total device us:")
        for name, us in tot.most_common(top_n):
            print(f"  {us:10.1f} us  x{cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
