"""Checkpoint/resume for SMC state (SURVEY §5.4).

The reference has no built-in checkpointing; its state is fully captured
by (particle_locations, particle_weights, data_record,
normalization_record, rng state). Here the device state is one pytree
(``SMCState``), so checkpointing is a direct serialization:

- ``save_npz``/``load_npz``: single-host, dependency-free.
- ``save_orbax``/``load_orbax``: orbax-backed, works for sharded state on
  multi-host meshes (each host writes its shards).

Host-side records (data_record / normalization_record / call_count) ride
along in the npz / orbax aux payload so an updater resumes byte-for-byte
(data_record as a pickled object array — its entries are heterogeneous
(outcome, expparams-pytree) tuples).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .smc import SMCState, SMCUpdater

__all__ = ["save_npz", "load_npz", "save_orbax", "load_orbax"]


def _records_payload(updater: SMCUpdater):
    # data_record entries are (outcome ndarray, expparams pytree of
    # ndarrays) — heterogeneous, so they ride as a pickled object array.
    data_record = np.empty(len(updater.data_record), dtype=object)
    for i, entry in enumerate(updater.data_record):
        data_record[i] = entry
    return {
        "normalization_record": np.asarray(
            updater.normalization_record, dtype=np.float64
        ),
        "call_count": np.int64(updater._call_count),
        "data_record": data_record,
    }


def _restore_records(updater: SMCUpdater, data):
    updater.normalization_record = list(
        np.asarray(data["normalization_record"])
    )
    updater._call_count = int(data["call_count"])
    if "data_record" in getattr(data, "files", data):
        updater.data_record = list(data["data_record"])


def save_npz(path, updater: SMCUpdater):
    """Write updater state + records to one .npz file."""
    state = jax.tree_util.tree_map(np.asarray, updater.state)
    payload = {f"state__{k}": v for k, v in state._asdict().items()}
    payload.update(_records_payload(updater))
    np.savez(path, **payload)


def load_npz(path, updater: SMCUpdater) -> SMCUpdater:
    """Restore state + records into an updater built with the same model/
    prior/config. Returns the updater."""
    data = np.load(path, allow_pickle=True)
    fields = {
        k[len("state__"):]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("state__")
    }
    updater.state = SMCState(**fields)
    # Keep host-side bookkeeping consistent with the restored shapes
    # (loading into a differently-sized updater is allowed).
    updater._n_particles = int(fields["particle_locations"].shape[0])
    _restore_records(updater, data)
    return updater


def save_orbax(path, updater: SMCUpdater):
    """Orbax checkpoint of the state pytree (+ JSON records sidecar)."""
    import orbax.checkpoint as ocp

    path = ocp.test_utils.erase_and_create_empty(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", updater.state._asdict())
    np.savez(path / "records.npz", **_records_payload(updater))


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
    records_npz = path / "records.npz"
    if records_npz.exists():
        _restore_records(updater, np.load(records_npz, allow_pickle=True))
    else:  # round-1 checkpoints used a JSON sidecar without data_record
        records = json.loads((path / "records.json").read_text())
        updater.normalization_record = records["normalization_record"]
        updater._call_count = records["call_count"]
    return updater
