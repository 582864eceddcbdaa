// geossl_native — C++ host runtime for the hot host-side paths.
//
// The reference delegates these to native dependencies: PyG collate loops in
// C, torch_cluster's C++/CUDA radius search, networkx-based BFS masking
// (Python, slow — Geom3D/datasets/datasets_3D.py:24-67). Here they are one
// small C-ABI library loaded via ctypes (no pybind11 in this image):
//
//   * pack_batch      — fill padded [B, N] buffers straight from a MolStore's
//                       flat arrays (zero per-record Python objects)
//   * bfs_subgraph    — random-BFS kept-node selection (GeoSSL atom masking)
//   * radius_edges    — fixed-radius neighbor pairs for preprocessing caches
//
// Build: g++ -O3 -march=native -shared -fPIC geossl_native.cpp -o libgeossl_native.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// SplitMix64 — deterministic, seedable, fast.
static inline uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

static inline uint64_t randbelow(uint64_t& s, uint64_t n) {
    return splitmix64(s) % n;  // modulo bias negligible for n << 2^64
}

// Pack selected molecules from flat store arrays into padded batch buffers.
// atom_flat: [sum_N] int32; pos_flat: [sum_N, 3] float; offsets: [M+1] int64;
// y_flat: [M, y_dim] float or nullptr; indices: [n_select] molecule ids.
// Outputs must be pre-zeroed or are fully overwritten here (we memset).
void pack_batch(const int32_t* atom_flat, const float* pos_flat,
                const int64_t* offsets, const float* y_flat, int64_t y_dim,
                const int64_t* indices, int64_t n_select,
                int64_t batch_size, int64_t n_max,
                int32_t* out_atom, float* out_pos, uint8_t* out_node_mask,
                uint8_t* out_graph_mask, float* out_y) {
    std::memset(out_atom, 0, sizeof(int32_t) * batch_size * n_max);
    std::memset(out_pos, 0, sizeof(float) * batch_size * n_max * 3);
    std::memset(out_node_mask, 0, batch_size * n_max);
    std::memset(out_graph_mask, 0, batch_size);
    if (out_y && y_flat) std::memset(out_y, 0, sizeof(float) * batch_size * y_dim);
    for (int64_t i = 0; i < n_select; ++i) {
        const int64_t mol = indices[i];
        const int64_t s = offsets[mol], e = offsets[mol + 1];
        const int64_t n = e - s;
        std::memcpy(out_atom + i * n_max, atom_flat + s, sizeof(int32_t) * n);
        std::memcpy(out_pos + i * n_max * 3, pos_flat + s * 3, sizeof(float) * n * 3);
        std::memset(out_node_mask + i * n_max, 1, n);
        out_graph_mask[i] = 1;
        if (out_y && y_flat)
            std::memcpy(out_y + i * y_dim, y_flat + mol * y_dim, sizeof(float) * y_dim);
    }
}

// Random-BFS kept-node selection (reference datasets_3D.py:24-44 semantics:
// grow until size > sub_num, uniform pick from the frontier set, random
// restart on empty frontier). Returns the kept count; out_keep gets the
// sorted kept indices. Frontier iteration over a sorted vector keeps the
// distribution identical to the reference's sorted-set choice.
int64_t bfs_subgraph(int64_t num_nodes, const int32_t* bond_src,
                     const int32_t* bond_dst, int64_t n_edges,
                     double mask_ratio, uint64_t seed, int64_t* out_keep) {
    if (num_nodes <= 0) return 0;
    const int64_t sub_num = (int64_t)(num_nodes * (1.0 - mask_ratio));
    // adjacency (CSR)
    std::vector<int32_t> deg(num_nodes, 0);
    for (int64_t k = 0; k < n_edges; ++k) deg[bond_src[k]]++;
    std::vector<int64_t> row(num_nodes + 1, 0);
    for (int64_t i = 0; i < num_nodes; ++i) row[i + 1] = row[i] + deg[i];
    std::vector<int32_t> col(n_edges);
    std::vector<int64_t> fill(row.begin(), row.end() - 1);
    for (int64_t k = 0; k < n_edges; ++k) col[fill[bond_src[k]]++] = bond_dst[k];

    uint64_t rng = seed ^ 0xda3e39cb94b95bdbULL;
    std::vector<uint8_t> in_sub(num_nodes, 0);
    std::vector<int32_t> frontier;  // kept sorted+unique
    std::vector<int64_t> kept;
    kept.reserve(num_nodes);

    auto add_frontier = [&](int32_t v) {
        if (in_sub[v]) return;
        auto it = std::lower_bound(frontier.begin(), frontier.end(), v);
        if (it == frontier.end() || *it != v) frontier.insert(it, v);
    };

    int32_t start = (int32_t)randbelow(rng, (uint64_t)num_nodes);
    kept.push_back(start);
    in_sub[start] = 1;
    for (int64_t k = row[start]; k < row[start + 1]; ++k) add_frontier(col[k]);

    while ((int64_t)kept.size() <= sub_num) {
        if (frontier.empty()) {
            int64_t remaining = num_nodes - (int64_t)kept.size();
            if (remaining == 0) break;
            int64_t pick = (int64_t)randbelow(rng, (uint64_t)remaining);
            for (int32_t v = 0; v < num_nodes; ++v) {
                if (!in_sub[v] && pick-- == 0) { frontier.push_back(v); break; }
            }
        }
        int32_t v = frontier[randbelow(rng, frontier.size())];
        frontier.erase(std::lower_bound(frontier.begin(), frontier.end(), v));
        if (in_sub[v]) continue;
        kept.push_back(v);
        in_sub[v] = 1;
        for (int64_t k = row[v]; k < row[v + 1]; ++k) add_frontier(col[k]);
    }
    std::sort(kept.begin(), kept.end());
    std::memcpy(out_keep, kept.data(), sizeof(int64_t) * kept.size());
    return (int64_t)kept.size();
}

// Fused BFS-mask + pack: for each selected molecule, run the random-BFS
// kept-node selection over its bond graph and gather the kept atoms straight
// into the padded batch buffers. This is the GeoSSL pretraining hot path
// (mask_ratio 0.3): doing it per-record in Python is ~5x slower than the
// TPU training step it feeds.
void pack_batch_bfs(const int32_t* atom_flat, const float* pos_flat,
                    const int64_t* offsets,
                    const int32_t* bond_src_flat, const int32_t* bond_dst_flat,
                    const int64_t* bond_offsets,
                    const float* y_flat, int64_t y_dim,
                    const int64_t* indices, int64_t n_select,
                    int64_t batch_size, int64_t n_max,
                    double mask_ratio, uint64_t seed,
                    int32_t* out_atom, float* out_pos, uint8_t* out_node_mask,
                    uint8_t* out_graph_mask, float* out_y) {
    std::memset(out_atom, 0, sizeof(int32_t) * batch_size * n_max);
    std::memset(out_pos, 0, sizeof(float) * batch_size * n_max * 3);
    std::memset(out_node_mask, 0, batch_size * n_max);
    std::memset(out_graph_mask, 0, batch_size);
    if (out_y && y_flat) std::memset(out_y, 0, sizeof(float) * batch_size * y_dim);
    std::vector<int64_t> keep;
    uint64_t rng = seed ^ 0x9e3779b97f4a7c15ULL;
    for (int64_t i = 0; i < n_select; ++i) {
        const int64_t mol = indices[i];
        const int64_t s = offsets[mol], e = offsets[mol + 1];
        const int64_t n = e - s;
        out_graph_mask[i] = 1;
        int64_t kept_n;
        keep.resize(n);
        if (mask_ratio <= 0.0 || n <= 1) {
            kept_n = n;
            for (int64_t k = 0; k < n; ++k) keep[k] = k;
        } else {
            const int64_t bs = bond_offsets[mol], be = bond_offsets[mol + 1];
            kept_n = bfs_subgraph(n, bond_src_flat + bs, bond_dst_flat + bs,
                                  be - bs, mask_ratio, splitmix64(rng),
                                  keep.data());
        }
        for (int64_t k = 0; k < kept_n; ++k) {
            const int64_t src = s + keep[k];
            out_atom[i * n_max + k] = atom_flat[src];
            std::memcpy(out_pos + (i * n_max + k) * 3, pos_flat + src * 3,
                        sizeof(float) * 3);
            out_node_mask[i * n_max + k] = 1;
        }
        if (out_y && y_flat)
            std::memcpy(out_y + i * y_dim, y_flat + mol * y_dim,
                        sizeof(float) * y_dim);
    }
}

// All ordered pairs (i, j), i != j, with |pos_i - pos_j| < r.
// Returns count; writes up to cap pairs.
int64_t radius_edges(const float* pos, int64_t n, double r,
                     int32_t* out_src, int32_t* out_dst, int64_t cap) {
    const double r2 = r * r;
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = 0; j < n; ++j) {
            if (i == j) continue;
            const double dx = (double)pos[i * 3] - pos[j * 3];
            const double dy = (double)pos[i * 3 + 1] - pos[j * 3 + 1];
            const double dz = (double)pos[i * 3 + 2] - pos[j * 3 + 2];
            if (dx * dx + dy * dy + dz * dz < r2) {
                if (cnt < cap) { out_src[cnt] = (int32_t)i; out_dst[cnt] = (int32_t)j; }
                ++cnt;
            }
        }
    }
    return cnt;
}

}  // extern "C"
