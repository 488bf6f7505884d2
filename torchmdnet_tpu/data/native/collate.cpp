// Native batch collation: the host-side hot path of the data loader.
//
// The reference's runtime work (neighbor kernels) moved to XLA/Pallas on TPU;
// what remains genuinely host-side in this framework is assembling padded
// static-shape batches from ragged per-molecule arrays at training-loop rate.
// This translation unit implements that assembly as tight memcpy/fill loops,
// exposed through a C ABI consumed via ctypes (torchmdnet_tpu/data/native.py).
//
// Layout contract (must match torchmdnet_tpu/data/batch.py:pad_molecules):
//   atoms of molecule m occupy slots [offsets[m], offsets[m+1]) of the
//   concatenated inputs and are written to consecutive output slots starting
//   at the running fill position; padding atoms carry z=0, pos=0,
//   batch=num_mol (trash segment), atom_mask=0.

#include <cstdint>
#include <cstring>

extern "C" {

// Returns 0 on success, -1 if the batch exceeds the atom capacity.
int pad_collate(
    // ragged inputs (concatenated over molecules)
    const int64_t* z_concat,        // (total_atoms,)
    const float* pos_concat,        // (total_atoms, 3)
    const float* y,                 // (n_mols,) or nullptr
    const float* neg_dy_concat,     // (total_atoms, 3) or nullptr
    const float* q,                 // (n_mols,) or nullptr
    const float* s,                 // (n_mols,) or nullptr
    const float* pq_concat,         // (total_atoms,) or nullptr
    const int64_t* offsets,         // (n_mols + 1,)
    int64_t n_mols,
    // static capacities
    int64_t num_atoms,
    int64_t num_mol,
    // outputs (pre-allocated by the caller)
    int32_t* z_out,                 // (num_atoms,)
    float* pos_out,                 // (num_atoms, 3)
    int32_t* batch_out,             // (num_atoms,)
    uint8_t* atom_mask_out,         // (num_atoms,)
    uint8_t* mol_mask_out,          // (num_mol,)
    float* y_out,                   // (num_mol, 1) or nullptr
    float* neg_dy_out,              // (num_atoms, 3) or nullptr
    float* q_out,                   // (num_mol,) or nullptr
    float* s_out,                   // (num_mol,) or nullptr
    float* pq_out                   // (num_atoms,) or nullptr
) {
    const int64_t total = offsets[n_mols];
    if (total > num_atoms || n_mols > num_mol) return -1;

    // padding defaults
    std::memset(z_out, 0, sizeof(int32_t) * num_atoms);
    std::memset(pos_out, 0, sizeof(float) * num_atoms * 3);
    std::memset(atom_mask_out, 0, num_atoms);
    std::memset(mol_mask_out, 0, num_mol);
    for (int64_t i = 0; i < num_atoms; ++i) batch_out[i] = (int32_t)num_mol;
    if (y_out) std::memset(y_out, 0, sizeof(float) * num_mol);
    if (neg_dy_out) std::memset(neg_dy_out, 0, sizeof(float) * num_atoms * 3);
    if (q_out) std::memset(q_out, 0, sizeof(float) * num_mol);
    if (s_out) std::memset(s_out, 0, sizeof(float) * num_mol);
    if (pq_out) std::memset(pq_out, 0, sizeof(float) * num_atoms);

    int64_t fill = 0;
    for (int64_t m = 0; m < n_mols; ++m) {
        const int64_t lo = offsets[m];
        const int64_t n = offsets[m + 1] - lo;
        for (int64_t i = 0; i < n; ++i) {
            z_out[fill + i] = (int32_t)z_concat[lo + i];
            batch_out[fill + i] = (int32_t)m;
            atom_mask_out[fill + i] = 1;
        }
        std::memcpy(pos_out + fill * 3, pos_concat + lo * 3, sizeof(float) * n * 3);
        if (neg_dy_out && neg_dy_concat)
            std::memcpy(neg_dy_out + fill * 3, neg_dy_concat + lo * 3,
                        sizeof(float) * n * 3);
        if (pq_out && pq_concat)
            std::memcpy(pq_out + fill, pq_concat + lo, sizeof(float) * n);
        mol_mask_out[m] = 1;
        if (y_out && y) y_out[m] = y[m];
        if (q_out && q) q_out[m] = q[m];
        if (s_out && s) s_out[m] = s[m];
        fill += n;
    }
    return 0;
}

}  // extern "C"
