"""Validate the vote-ranked SlideGraph association bound (VERDICT r4 ask #2).

Checks, on the reference's recorded maps:
  1. dense self-match: robot2Map_forest (792 objects) vs a known SE(2)
     perturbation of itself -> recovered TF within 0.5 m / 2 deg.
  2. all SG_PAIRS cross-robot matchings still satisfy perturbation
     consistency.
Run: JAX_PLATFORMS=cpu python scripts/check_slidegraph_dense.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from slide_slam_tpu.config import SlideGraphConfig
from slide_slam_tpu.place_recognition.slidegraph import SlideGraph

REF_DATA = "/root/reference/backend/sloam/clipper_semantic_object/examples/data"


def load_map(robot, dataset):
    raw = np.loadtxt(os.path.join(REF_DATA, f"robot{robot}Map_{dataset}.txt"))
    out = np.zeros((len(raw), 7), np.float32)
    out[:, :raw.shape[1]] = raw
    return out


def se2(yaw_deg, tx, ty):
    y = np.deg2rad(yaw_deg)
    t = np.eye(4)
    t[:2, :2] = [[np.cos(y), -np.sin(y)], [np.sin(y), np.cos(y)]]
    t[0, 3], t[1, 3] = tx, ty
    return t


def apply_tf(tf, objs):
    out = objs.copy()
    out[:, 1:4] = (tf[:3, :3] @ objs[:, 1:4].T).T + tf[:3, 3]
    return out


def yaw_of(tf):
    return np.rad2deg(np.arctan2(tf[1, 0], tf[0, 0]))


def main():
    sg = SlideGraph(SlideGraphConfig())
    fails = 0

    # 1. dense self-matches under perturbation: recovered tf must equal P^-1
    for ds, r in [("forest", 0), ("forest", 1), ("forest", 2),
                  ("parking", 0), ("parking", 2)]:
        m = load_map(r, ds)
        P = se2(35.0, 7.5, -4.0)
        t0 = time.time()
        found, tf = sg.find_inter_loop_closure(m, apply_tf(P, m))
        dt = time.time() - t0
        if not found:
            print(f"FAIL self {ds} robot{r} ({len(m)} objs): no closure")
            fails += 1
            continue
        expect = np.linalg.inv(P)
        terr = np.linalg.norm(tf[:2, 3] - expect[:2, 3])
        yerr = abs((yaw_of(tf) - yaw_of(expect) + 180) % 360 - 180)
        ok = terr < 0.5 and yerr < 2.0
        fails += not ok
        print(f"{'ok  ' if ok else 'FAIL'} self {ds} robot{r} "
              f"({len(m)} objs): terr={terr:.3f} m yerr={yerr:.2f} deg "
              f"[{dt:.1f}s]")

    # 2. cross-robot perturbation consistency (the golden-fixture property)
    for ds, a, b in [("forest", 0, 1), ("forest", 1, 2), ("forest", 0, 2),
                     ("parking", 0, 2)]:
        ref, qry = load_map(a, ds), load_map(b, ds)
        P = se2(90.0, 5.25, 5.25)
        f0, tf0 = sg.find_inter_loop_closure(ref, qry)
        f1, tf1 = sg.find_inter_loop_closure(ref, apply_tf(P, qry))
        if not (f0 and f1):
            print(f"FAIL pair {ds} {a}-{b}: found0={f0} found1={f1}")
            fails += 1
            continue
        expect = tf0 @ np.linalg.inv(P)
        terr = np.linalg.norm(tf1[:2, 3] - expect[:2, 3])
        yerr = abs((yaw_of(tf1) - yaw_of(expect) + 180) % 360 - 180)
        ok = terr < 0.5 and yerr < 2.0
        fails += not ok
        print(f"{'ok  ' if ok else 'FAIL'} pair {ds} {a}-{b}: "
              f"terr={terr:.3f} m yerr={yerr:.2f} deg")

    print("ALL OK" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
