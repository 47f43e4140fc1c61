"""One-time asset importer.

Extracts the *physical model parameters* (masses, geoms, joints, gears, demo
trajectories) that behavioral parity requires from the upstream reference at
/root/reference, and re-emits them in our own canonical formats:

 - MJCF scenes are compiled with the MuJoCo C library and re-serialized via
   ``mj_saveLastXML`` (defaults expanded, canonical formatting) into
   ``mbd_tpu/assets/``.
 - Demo trajectories (``car2d_xref.npy``, ``jog_xref.pkl``/``walk_xref.pkl``)
   are converted to plain ``.npy``/``.npz``.

Run: ``python tools/import_assets.py``. The framework never reads the
reference tree at runtime.
"""

from __future__ import annotations

import os
import pickle

import mujoco
import numpy as np

REF = "/root/reference/mbd/assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "mbd_tpu", "assets")

SCENES = ["cartpole", "pushT", "humanoidrun", "humanoidstandup", "humanoidtrack"]


def import_scenes():
    for name in SCENES:
        model = mujoco.MjModel.from_xml_path(f"{REF}/{name}.xml")
        out = os.path.join(OUT, f"{name}.xml")
        mujoco.mj_saveLastXML(out, model)
        print(f"wrote {out}")


def import_gym_scenes():
    """Standard locomotion morphologies from the installed gymnasium package
    (same lineage as the brax-registry envs the reference uses for
    ant/halfcheetah and the brax assets for hopper/walker2d)."""
    import gymnasium.envs.mujoco as gm
    asset_dir = os.path.join(os.path.dirname(gm.__file__), "assets")
    for src, dst in [("hopper.xml", "hopper.xml"),
                     ("walker2d.xml", "walker2d.xml"),
                     ("ant.xml", "ant.xml"),
                     ("half_cheetah.xml", "halfcheetah.xml")]:
        model = mujoco.MjModel.from_xml_path(os.path.join(asset_dir, src))
        out = os.path.join(OUT, dst)
        mujoco.mj_saveLastXML(out, model)
        print(f"wrote {out}")


def import_demos():
    xref = np.load(f"{REF}/car2d_xref.npy")
    np.save(os.path.join(OUT, "car2d_xref.npy"), np.asarray(xref, np.float32))
    print("wrote car2d_xref.npy", xref.shape)

    def _np_reconstruct(fun, args, arr_state, aval_state):
        # Replacement for jax._src.array._reconstruct_array: the reference
        # pickles were written by an old JAX whose aval state ('named_shape')
        # no longer exists; we only want the underlying numpy buffer.
        np_value = fun(*args)
        np_value.__setstate__(arr_state)
        return np_value

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name == "_reconstruct_array":
                return _np_reconstruct
            return super().find_class(module, name)

    for demo in ["jog", "walk"]:
        with open(f"{REF}/{demo}_xref.pkl", "rb") as f:
            d = _Unpickler(f).load()
        np.savez(os.path.join(OUT, f"{demo}_xref.npz"),
                 **{k: np.asarray(v, np.float32) for k, v in d.items()})
        print(f"wrote {demo}_xref.npz with {len(d)} bodies")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    import_scenes()
    import_gym_scenes()
    import_demos()
