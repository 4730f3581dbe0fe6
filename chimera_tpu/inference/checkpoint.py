"""Chain checkpoint / restart via HDF5.

Capability parity with CHIMERA/utils/emcee_utils.py:11-152: numbered chain
files ``<prefix>_<n>.h5`` discovered on restart, with the last sample (and
here, the full sampler pytree state including the PRNG key) resumable.
Precompute artifacts use the generic object round-trip in
chimera_tpu.data.io.
"""

from __future__ import annotations

import os
import re
from typing import Iterable

import h5py
import jax.numpy as jnp
import numpy as np

from chimera_tpu.inference.ensemble import EnsembleState


def _chain_index(path: str, prefix: str) -> int | None:
    m = re.fullmatch(re.escape(os.path.basename(prefix)) + r"_(\d+)\.h5",
                     os.path.basename(path))
    return int(m.group(1)) if m else None


def latest_chain_file(prefix: str) -> str | None:
    """Highest-numbered existing ``<prefix>_<n>.h5`` (emcee_utils.py:11-50)."""
    d = os.path.dirname(prefix) or "."
    if not os.path.isdir(d):
        return None
    best, best_n = None, -1
    for f in os.listdir(d):
        full = os.path.join(d, f)
        n = _chain_index(full, prefix)
        if n is not None and n > best_n:
            best, best_n = full, n
    return best


def next_chain_file(prefix: str) -> str:
    latest = latest_chain_file(prefix)
    n = -1 if latest is None else _chain_index(latest, prefix)
    return f"{prefix}_{n + 1}.h5"


def save_chain(path: str, state: EnsembleState, history: dict,
               param_names: Iterable[str]) -> None:
    """Write a chain segment + full sampler state."""
    with h5py.File(path, "w") as f:
        f.attrs["param_names"] = list(param_names)
        f.attrs["iteration"] = int(state.iteration)
        f.create_dataset("chain", data=np.asarray(history["coords"]))
        f.create_dataset("log_prob", data=np.asarray(history["log_prob"]))
        g = f.create_group("state")
        g.create_dataset("coords", data=np.asarray(state.coords))
        g.create_dataset("state_log_prob", data=np.asarray(state.log_prob))
        g.create_dataset("key", data=np.asarray(state.key))
        g.create_dataset("n_accepted", data=np.asarray(state.n_accepted))


def load_state(path: str) -> tuple[EnsembleState, list[str]]:
    """Resume: rebuild the sampler pytree from the last checkpoint."""
    with h5py.File(path, "r") as f:
        names = [s if isinstance(s, str) else s.decode()
                 for s in f.attrs["param_names"]]
        g = f["state"]
        state = EnsembleState(
            coords=jnp.asarray(g["coords"][:]),
            log_prob=jnp.asarray(g["state_log_prob"][:]),
            key=jnp.asarray(g["key"][:]),
            n_accepted=jnp.asarray(g["n_accepted"][:]),
            iteration=jnp.asarray(int(f.attrs["iteration"])),
        )
    return state, names


def load_chain(path: str) -> dict:
    with h5py.File(path, "r") as f:
        return {"chain": f["chain"][:], "log_prob": f["log_prob"][:],
                "param_names": [s if isinstance(s, str) else s.decode()
                                for s in f.attrs["param_names"]]}


# ---------------------------------------------------------------------------
# HMC checkpoints (post-warmup state + adapted quantities + PRNG key)
# ---------------------------------------------------------------------------

def save_hmc(path: str, samples, stats: dict, key,
             param_names: Iterable[str]) -> None:
    """Checkpoint an HMC run: thinned samples, the final chain state, the
    frozen adaptation (step size, inverse mass), and the next PRNG key —
    everything :func:`chimera_tpu.inference.hmc.continue_hmc` needs."""
    state = stats["final_state"]
    with h5py.File(path, "w") as f:
        f.attrs["param_names"] = list(param_names)
        f.create_dataset("samples", data=np.asarray(samples))
        f.create_dataset("log_prob", data=np.asarray(stats["log_prob"]))
        g = f.create_group("state")
        g.create_dataset("y", data=np.asarray(state.y))
        g.create_dataset("logp", data=np.asarray(state.logp))
        g.create_dataset("grad", data=np.asarray(state.grad))
        g.create_dataset("step_size", data=np.asarray(stats["step_size"]))
        g.create_dataset("inv_mass", data=np.asarray(stats["inv_mass"]))
        g.create_dataset("key", data=np.asarray(key))


def load_hmc(path: str):
    """(state, step_size, inv_mass, key, param_names) from a checkpoint."""
    from chimera_tpu.inference.hmc import HMCState

    with h5py.File(path, "r") as f:
        names = [s if isinstance(s, str) else s.decode()
                 for s in f.attrs["param_names"]]
        g = f["state"]
        state = HMCState(y=jnp.asarray(g["y"][:]),
                         logp=jnp.asarray(g["logp"][:]),
                         grad=jnp.asarray(g["grad"][:]))
        return (state, jnp.asarray(g["step_size"][()]),
                jnp.asarray(g["inv_mass"][:]), jnp.asarray(g["key"][:]),
                names)
