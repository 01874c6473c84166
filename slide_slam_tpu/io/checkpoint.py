"""Checkpoint / resume of the full SLAM state.

The reference has NO runtime recovery: a crashed sloam_node restarts empty
and loses its own history (SURVEY §5). Here the whole engine state is a
pytree of arrays, so checkpointing is a snapshot: GraphState + the host-side
database (packets, bookmarks, TF table) round-trip through one npz file.
"""
from __future__ import annotations

import io
import json
import os
from typing import TYPE_CHECKING

import numpy as np

from ..factorgraph.graph import GraphState

if TYPE_CHECKING:
    from ..runtime.node import SlamNode


def save_graph_state(path: str, state: GraphState):
    np.savez_compressed(path, **{f: np.asarray(getattr(state, f))
                                 for f in state._fields})


def load_graph_state(path: str) -> GraphState:
    import jax.numpy as jnp

    z = np.load(path)
    return GraphState(**{f: jnp.asarray(z[f]) for f in GraphState._fields})


def _packet_to_dict(p):
    return {k: np.asarray(getattr(p, k)).tolist() if k != "stamp" else p.stamp
            for k in p.__dataclass_fields__}


def save_node(dirpath: str, node: "SlamNode"):
    """Full node snapshot: device graph + host database + bookkeeping."""
    os.makedirs(dirpath, exist_ok=True)
    save_graph_state(os.path.join(dirpath, "graph.npz"), node.state)

    from ..comm.database import PoseMstPair

    db = {}
    for rid, rec in node.dbm.records.items():
        db[str(rid)] = {
            "bookmark_fg": rec.bookmark_fg,
            "packets": [_packet_to_dict(p) for p in rec.packets],
        }
    meta = {
        "robot_id": node.robot_id,
        "key_stamps": node.key_stamps,
        "key_poses": [p.tolist() for p in node.key_poses],
        "latest_odom": (node.latest_odom.tolist()
                        if node.latest_odom is not None else None),
        "loop_closure_tf": {str(k): v.tolist()
                            for k, v in node.dbm.loop_closure_tf.items()},
        "maps": {str(k): v.tolist() for k, v in node.dbm.maps.items()},
        "db": db,
    }
    with open(os.path.join(dirpath, "node.json"), "w") as f:
        json.dump(meta, f)


def load_node(dirpath: str, cfg, node_cls=None) -> "SlamNode":
    from ..comm.database import PoseMstPair, RobotRecord
    from ..runtime.node import SlamNode

    node_cls = node_cls or SlamNode
    with open(os.path.join(dirpath, "node.json")) as f:
        meta = json.load(f)
    node = node_cls(cfg, robot_id=int(meta["robot_id"]))
    node.state = load_graph_state(os.path.join(dirpath, "graph.npz"))
    node.key_stamps = list(meta["key_stamps"])
    node.key_poses = [np.asarray(p, np.float32) for p in meta["key_poses"]]
    node.latest_odom = (np.asarray(meta["latest_odom"], np.float32)
                        if meta["latest_odom"] is not None else None)
    node.dbm.loop_closure_tf = {
        int(k): np.asarray(v, np.float32)
        for k, v in meta["loop_closure_tf"].items()}
    node.dbm.maps = {int(k): np.asarray(v, np.float32).reshape(-1, 7)
                     for k, v in meta["maps"].items()}
    node.dbm.records = {}
    for rid, rec in meta["db"].items():
        rr = RobotRecord(bookmark_fg=int(rec["bookmark_fg"]))
        for pd in rec["packets"]:
            rr.packets.append(PoseMstPair(
                stamp=float(pd["stamp"]),
                **{k: np.asarray(pd[k],
                                 np.int32 if k.endswith("label") else np.float32)
                   for k in pd if k != "stamp"}))
        node.dbm.records[int(rid)] = rr
    node.rebuild_mirrors()
    return node
