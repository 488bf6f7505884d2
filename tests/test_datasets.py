"""Dataset tests: Custom globs matrix (reference tests/test_datasets.py),
HDF5 lazy-open + parsing, ANI/SPICE/Ace parsing of synthetic raw files in the
real formats, and the padded loader."""

import os

import h5py
import numpy as np
import pytest

from torchmdnet_tpu.data.datasets import (
    ANI1X,
    SPICE,
    Ace,
    Custom,
    DummyDataset,
    HDF5,
)
from torchmdnet_tpu.data.loader import PaddedLoader


@pytest.mark.parametrize("energy", [True, False])
@pytest.mark.parametrize("forces", [True, False])
def test_custom(energy, forces, tmp_path):
    if not energy and not forces:
        with pytest.raises(AssertionError):
            Custom(coordglob="*", embedglob="*")
        return

    n_files, n_frames, n_atoms = 3, 6, 5
    for i in range(n_files):
        np.save(tmp_path / f"coords_{i}.npy", np.random.rand(n_frames, n_atoms, 3).astype(np.float32))
        np.save(tmp_path / f"embed_{i}.npy", np.random.randint(1, 10, n_atoms))
        if energy:
            np.save(tmp_path / f"energy_{i}.npy", np.random.rand(n_frames, 1).astype(np.float32))
        if forces:
            np.save(tmp_path / f"force_{i}.npy", np.random.rand(n_frames, n_atoms, 3).astype(np.float32))

    data = Custom(
        coordglob=str(tmp_path / "coords*"),
        embedglob=str(tmp_path / "embed*"),
        energyglob=str(tmp_path / "energy*") if energy else None,
        forceglob=str(tmp_path / "force*") if forces else None,
    )
    assert len(data) == n_files * n_frames
    sample = data[0]
    assert sample["z"].shape == (n_atoms,)
    assert sample["pos"].shape == (n_atoms, 3)
    assert ("y" in sample) == energy
    assert ("neg_dy" in sample) == forces
    assert (data.sample_sizes() == n_atoms).all()


def test_hdf5(tmp_path):
    path = str(tmp_path / "test.h5")
    with h5py.File(path, "w") as f:
        g1 = f.create_group("size4")
        g1["types"] = np.random.randint(1, 10, (3, 4))
        g1["pos"] = np.random.rand(3, 4, 3).astype(np.float32)
        g1["energy"] = np.random.rand(3).astype(np.float64)
        g1["forces"] = np.random.rand(3, 4, 3).astype(np.float32)
        g2 = f.create_group("size7")
        g2["types"] = np.random.randint(1, 10, (2, 7))
        g2["pos"] = np.random.rand(2, 7, 3).astype(np.float32)
        g2["energy"] = np.random.rand(2).astype(np.float64)
        g2["forces"] = np.random.rand(2, 7, 3).astype(np.float32)
        meta = f.create_group("_metadata")
        meta["distance_scale"] = np.array(1e-10)

    data = HDF5(path)
    # lazy open: no index built at ctor (reference datasets/hdf.py:70-76)
    assert data.index is None
    assert len(data) == 5
    sizes = sorted(data.sample_sizes().tolist())
    assert sizes == [4, 4, 4, 7, 7]
    s = data[0]
    assert s["z"].shape[0] in (4, 7)
    assert s["pos"].shape == (s["z"].shape[0], 3)
    assert s["y"].shape == (1,)
    assert "neg_dy" in s
    assert float(data.distance_scale) == 1e-10


def test_ani1x_format(tmp_path):
    """Synthetic ani1x-release.h5 in the real layout parses + mmap-processes."""
    root = str(tmp_path)
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    with h5py.File(os.path.join(raw, "ani1x-release.h5"), "w") as f:
        for name, n, confs in [("mol1", 3, 4), ("mol2", 5, 2)]:
            g = f.create_group(name)
            g["atomic_numbers"] = np.random.choice([1, 6, 7, 8], n)
            g["coordinates"] = np.random.rand(confs, n, 3).astype(np.float32)
            g["wb97x_dz.energy"] = np.random.rand(confs).astype(np.float64) - 50.0
            g["wb97x_dz.forces"] = np.random.rand(confs, n, 3).astype(np.float32)

    data = ANI1X(root)
    assert len(data) == 6
    s = data[0]
    assert s["pos"].shape == (3, 3)
    assert "neg_dy" in s
    # energies were converted to eV and referenced
    assert np.isfinite(s["y"]).all()
    # reopening reuses the processed memmaps
    data2 = ANI1X(root)
    np.testing.assert_allclose(data2[0]["y"], s["y"])


def test_spice_format(tmp_path):
    root = str(tmp_path)
    raw = os.path.join(root, "raw", "1.1.3")
    os.makedirs(raw)
    with h5py.File(os.path.join(raw, "SPICE-1.1.3.hdf5"), "w") as f:
        for name, n, confs in [("molA", 4, 3), ("molB", 6, 2)]:
            g = f.create_group(name)
            g["subset"] = [b"SPICE PubChem Set 1"]
            g["atomic_numbers"] = np.random.choice([1, 6, 7, 8], n)
            g["conformations"] = np.random.rand(confs, n, 3).astype(np.float32)
            g["formation_energy"] = np.random.rand(confs).astype(np.float64)
            g["dft_total_gradient"] = np.random.rand(confs, n, 3).astype(np.float32)

    data = SPICE(root, version="1.1.3")
    assert len(data) == 5
    s = data[0]
    assert s["pos"].shape == (4, 3)
    # Bohr -> Angstrom applied
    assert "neg_dy" in s

    # subset filter
    data_none = SPICE(root, version="1.1.3", subsets=["nonexistent"])
    assert len(data_none) == 0


def test_ace_format_v2(tmp_path):
    root = str(tmp_path)
    h5path = os.path.join(root, "ace.h5")
    os.makedirs(root, exist_ok=True)
    with h5py.File(h5path, "w") as f:
        f.attrs["layout"] = "Ace"
        f.attrs["layout_version"] = "2.0"
        master = f.create_group("master")
        for name, n, confs in [("m1", 3, 2)]:
            g = master.create_group(name)
            g["atomic_numbers"] = np.random.choice([1, 6, 8], n)
            g["formal_charges"] = np.zeros(n, dtype=np.int64)
            d = g.create_dataset("positions", data=np.random.rand(confs, n, 3).astype(np.float32))
            d.attrs["units"] = "Å"
            d = g.create_dataset("formation_energies", data=np.random.rand(confs).astype(np.float64))
            d.attrs["units"] = "eV"
            d = g.create_dataset("forces", data=np.random.rand(confs, n, 3).astype(np.float32))
            d.attrs["units"] = "eV/Å"
            d = g.create_dataset("partial_charges", data=np.random.rand(confs, n).astype(np.float32))
            d.attrs["units"] = "e"
            d = g.create_dataset("dipole_moments", data=np.random.rand(confs, 3).astype(np.float32))
            d.attrs["units"] = "e*Å"

    data = Ace(root=root, paths=h5path)
    assert len(data) == 2
    s = data[0]
    assert "pq" in s and s["pq"].shape == (3,)
    assert "dp" in s and s["dp"].shape == (3,)
    assert "q" in s


def test_padded_loader_shapes():
    ds = DummyDataset(num_samples=25, num_atoms=7)
    loader = PaddedLoader(ds, batch_size=8, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b.z.shape == (batches[0].z.shape[0],)
        assert b.num_mol == 8
    # last batch is partially filled
    assert int(batches[-1].mol_mask.sum()) == 1
    # shuffling differs across epochs
    b2 = next(iter(loader))
    assert not np.array_equal(np.asarray(batches[0].pos), np.asarray(b2.pos))


def test_native_collate_matches_numpy():
    """C++ collation engine produces identical batches to the numpy path."""
    from torchmdnet_tpu.data.native_collate import load_library

    if load_library() is None:
        pytest.skip("no C++ toolchain")

    ds = DummyDataset(num_samples=16, num_atoms=6)
    fast = PaddedLoader(ds, batch_size=5, shuffle=False, use_native=True)
    slow = PaddedLoader(ds, batch_size=5, shuffle=False, use_native=False)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
        np.testing.assert_array_equal(np.asarray(a.batch), np.asarray(b.batch))
        np.testing.assert_array_equal(np.asarray(a.atom_mask), np.asarray(b.atom_mask))
        np.testing.assert_array_equal(np.asarray(a.mol_mask), np.asarray(b.mol_mask))
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
        np.testing.assert_array_equal(np.asarray(a.neg_dy), np.asarray(b.neg_dy))


def test_prefetching_loader():
    ds = DummyDataset(num_samples=12, num_atoms=5)
    plain = list(PaddedLoader(ds, batch_size=4, shuffle=True, seed=3))
    pre = list(PaddedLoader(ds, batch_size=4, shuffle=True, seed=3, prefetch=2))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
