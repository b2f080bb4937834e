"""Device op-time profile of the fused VO step (no tensorboard needed).

Captures a jax.profiler trace of N sustained frames and aggregates the TPU
device plane's per-op durations straight from the xplane protobuf with a
minimal wire-format parser (the installed tensorboard_plugin_profile lacks
the xplane proto + a working pywrap converter in this environment).

This is the tool that produced the round-4 budget in README.md: per-frame
while-loop totals (LK iteration loops, PnP refine/hypothesis loops, BA LM
passes) and the op-kind split (multiply = selector-contraction region
extraction, fusion, copies).

Usage: python tools/op_profile.py [n_frames]   (default 20, TPU)
"""

import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            return val, i
        shift += 7


def parse_msg(buf):
    """Protobuf wire parse -> {field_number: [(wire_type, value), ...]}."""
    out = collections.defaultdict(list)
    i, n = 0, len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        out[fn].append((wt, v))
    return out


def aggregate(xplane_path, frames):
    space = parse_msg(open(xplane_path, "rb").read())
    for _, plane_buf in space[1]:  # XSpace.planes
        plane = parse_msg(plane_buf)
        name = plane[2][0][1].decode() if plane.get(2) else "?"
        if "TPU" not in name or "interface" in name.lower():
            continue
        meta = {}
        for _, ent in plane.get(4, []):  # event_metadata map
            e = parse_msg(ent)
            k = e[1][0][1] if e.get(1) else 0
            if e.get(2):
                md = parse_msg(e[2][0][1])
                meta[k] = md[2][0][1].decode() if md.get(2) else "?"
        tot = collections.Counter()
        for _, line_buf in plane.get(3, []):  # lines
            line = parse_msg(line_buf)
            lname = line[2][0][1].decode() if line.get(2) else "?"
            if lname != "XLA Ops":
                continue
            for _, ev_buf in line.get(4, []):  # events
                ev = parse_msg(ev_buf)
                mid = ev[1][0][1] if ev.get(1) else 0
                dur = ev[3][0][1] if ev.get(3) else 0
                tot[meta.get(mid, str(mid))] += dur
        kinds = collections.Counter()
        for nm, t in tot.items():
            m = re.match(r"%([a-z\-]+)", nm)
            kinds[m.group(1) if m else nm[:12]] += t
        print(f"device plane: {name}")
        print(f"\nper-frame by op kind (ms, over {frames} frames):")
        for k, t in kinds.most_common(12):
            print(f"  {k:22s} {t / 1e9 / frames:7.3f}")
        ws = sorted(((t, nm) for nm, t in tot.items()
                     if nm.startswith("%while")), reverse=True)
        print("\ntop while-loops per frame (ms):")
        for t, nm in ws[:20]:
            shape = nm.split("=", 1)[1][:58] if "=" in nm else ""
            print(f"  {t / 1e9 / frames:7.3f}  {nm.split(' ')[0]}{shape}")
        print(f"\nwhile total/frame: {sum(t for t, _ in ws) / 1e9 / frames:.3f} ms")


def main():
    import jax
    import jax.numpy as jnp

    from visfs_tpu.io.sim import cached_textured_sequence
    from visfs_tpu.slam.system import System

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seq = cached_textured_sequence(n_frames=frames + 40, width=640,
                                   height=480, motion="square", seed=0,
                                   speed=2.0)
    cam = seq.camera
    s = System({"Tracker/MaxFeatures": 120, "Tracker/MinDistance": 40,
                "LocalMap/MapSize": 5, "Optimizer/Iterations": 20})
    s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
           float(cam.baseline), width=cam.width, height=cam.height)
    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready((lefts, rights))
    for i in range(5):
        s.input_primary_sensor_data(float(seq.stamps[i]), lefts[i], rights[i])
    s.drain_outputs()

    trace_dir = tempfile.mkdtemp(prefix="visfs_trace_")
    jax.profiler.start_trace(trace_dir)
    for i in range(5, 5 + frames):
        s.input_primary_sensor_data(float(seq.stamps[i]), lefts[i], rights[i])
    s.drain_outputs()
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert paths, f"no xplane trace written under {trace_dir}"
    aggregate(paths[0], frames)


if __name__ == "__main__":
    main()
