"""Layout tests for the hybrid (multi-slice / DCN) mesh branch.

`make_mesh(hybrid=True)` is the SURVEY.md §5.8 answer for multi-slice pods:
the PARAMS (walker-batch) axis must ride the slow DCN links between slices
while the DATA (event/injection psum) axis stays on intra-slice ICI.  No
multi-slice hardware is reachable from the test environment, so the branch
is exercised with mock device objects carrying the `slice_index` attribute
that real multi-slice TPU devices expose (the exact attribute
`jax.experimental.mesh_utils.create_hybrid_device_mesh` dispatches on).
"""

import numpy as np
import pytest

from chimera_tpu.parallel.mesh import DATA_AXIS, PARAMS_AXIS, make_mesh


class _FakeDevice:
    """Minimal stand-in for a multi-slice TPU device: mesh construction only
    touches `id` / `slice_index` / `process_index` / `platform` / coords."""

    platform = "tpu"
    device_kind = "fake-tpu"

    def __init__(self, dev_id: int, slice_index: int):
        self.id = dev_id
        self.slice_index = slice_index
        self.process_index = slice_index
        # 2x2 intra-slice grid so create_device_mesh's TPU path has coords
        self.coords = (dev_id % 2, (dev_id // 2) % 2, 0)
        self.core_on_chip = 0

    def __repr__(self):
        return f"FakeDevice(id={self.id}, slice={self.slice_index})"


def _fake_pod(n_slices: int, per_slice: int):
    return [
        _FakeDevice(s * per_slice + i, s)
        for s in range(n_slices)
        for i in range(per_slice)
    ]


def test_hybrid_mesh_params_axis_spans_slices():
    # 2 slices x 4 devices, params=2: each params index must live on ONE
    # slice (the walker halves talk over DCN), and each params row must
    # hold a full intra-slice data axis (the psums ride ICI).
    devices = _fake_pod(n_slices=2, per_slice=4)
    mesh = make_mesh(params=2, data=4, devices=devices, hybrid=True)
    assert mesh.axis_names == (PARAMS_AXIS, DATA_AXIS)
    dev_arr = np.asarray(mesh.devices)
    assert dev_arr.shape == (2, 4)
    for p in range(2):
        slices = {d.slice_index for d in dev_arr[p]}
        assert len(slices) == 1, (
            f"params row {p} mixes slices {slices}: the data axis would "
            "psum over DCN")
    assert {dev_arr[0, 0].slice_index, dev_arr[1, 0].slice_index} == {0, 1}


def test_hybrid_mesh_four_slices():
    devices = _fake_pod(n_slices=4, per_slice=4)
    mesh = make_mesh(params=4, data=4, devices=devices, hybrid=True)
    dev_arr = np.asarray(mesh.devices)
    assert dev_arr.shape == (4, 4)
    # one slice per params index, all four slices used
    row_slices = [
        {d.slice_index for d in dev_arr[p]} for p in range(4)
    ]
    assert all(len(s) == 1 for s in row_slices)
    assert set().union(*row_slices) == {0, 1, 2, 3}


def test_hybrid_mesh_params_not_divisible_by_slices_raises():
    devices = _fake_pod(n_slices=2, per_slice=4)
    with pytest.raises(ValueError, match="divisible by the" ):
        make_mesh(params=1, data=8, devices=devices, hybrid=True)


def test_hybrid_mesh_single_slice_matches_default():
    # on a single slice the hybrid layout must degrade to the plain reshape
    devices = _fake_pod(n_slices=1, per_slice=8)
    hybrid = make_mesh(params=2, data=4, devices=devices, hybrid=True)
    plain = make_mesh(params=2, data=4, devices=devices, hybrid=False)
    assert [d.id for d in np.asarray(hybrid.devices).ravel()] == [
        d.id for d in np.asarray(plain.devices).ravel()]
