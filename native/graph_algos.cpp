// Native graph algorithms for CLIPPER-style robust association alternates.
//
// The reference's CLIPPER library offers three alternates to the
// projected-gradient dense-clique relaxation (clipper_semantic_object/):
//   * exact / heuristic / k-core maximum clique (maxclique.cpp, via PMC)
//   * exact densest subgraph via Goldberg's flow algorithm (dsd.cpp),
//     used both standalone and as the Rounding::DSD mode of
//     CLIPPER::findDenseClique (clipper.cpp:293-300)
// Both are inherently sequential combinatorial searches — wrong shape for
// the TPU — so, like the reference, they live in native code. Clean-room
// implementations: bitset branch-and-bound with greedy colouring for max
// clique, Dinic blocking-flow + binary search on the density for the
// densest subgraph. Exposed as a C API consumed via ctypes
// (slide_slam_tpu/native.py).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// --------------------------------------------------------------------------
// Bitset adjacency helpers
// --------------------------------------------------------------------------

struct BitGraph {
  int n = 0;
  int words = 0;
  std::vector<uint64_t> adj;  // n rows of `words` u64 each

  explicit BitGraph(int n_) : n(n_), words((n_ + 63) / 64), adj(size_t(n_) * ((n_ + 63) / 64), 0) {}

  uint64_t* row(int v) { return adj.data() + size_t(v) * words; }
  const uint64_t* row(int v) const { return adj.data() + size_t(v) * words; }

  void add_edge(int u, int v) {
    row(u)[v >> 6] |= uint64_t(1) << (v & 63);
    row(v)[u >> 6] |= uint64_t(1) << (u & 63);
  }
  bool has(int u, int v) const {
    return (row(u)[v >> 6] >> (v & 63)) & 1;
  }
  int degree(int v) const {
    int d = 0;
    const uint64_t* r = row(v);
    for (int w = 0; w < words; ++w) d += __builtin_popcountll(r[w]);
    return d;
  }
};

using Bits = std::vector<uint64_t>;

inline void bits_and(const uint64_t* a, const uint64_t* b, uint64_t* out, int words) {
  for (int w = 0; w < words; ++w) out[w] = a[w] & b[w];
}
inline int bits_count(const uint64_t* a, int words) {
  int c = 0;
  for (int w = 0; w < words; ++w) c += __builtin_popcountll(a[w]);
  return c;
}
inline bool bits_test(const uint64_t* a, int v) {
  return (a[v >> 6] >> (v & 63)) & 1;
}
inline void bits_clear(uint64_t* a, int v) { a[v >> 6] &= ~(uint64_t(1) << (v & 63)); }
inline void bits_set(uint64_t* a, int v) { a[v >> 6] |= uint64_t(1) << (v & 63); }

// --------------------------------------------------------------------------
// k-core decomposition (peeling). Returns core number per vertex.
// --------------------------------------------------------------------------

std::vector<int> core_numbers(const BitGraph& g) {
  const int n = g.n;
  std::vector<int> deg(n), core(n, 0), order(n);
  for (int v = 0; v < n; ++v) deg[v] = g.degree(v);
  std::iota(order.begin(), order.end(), 0);
  std::vector<char> removed(n, 0);
  int cur = 0;
  for (int it = 0; it < n; ++it) {
    int best = -1, bestd = n + 1;
    for (int v = 0; v < n; ++v)
      if (!removed[v] && deg[v] < bestd) { bestd = deg[v]; best = v; }
    if (best < 0) break;
    cur = std::max(cur, deg[best]);
    core[best] = cur;
    removed[best] = 1;
    const uint64_t* r = g.row(best);
    for (int v = 0; v < n; ++v)
      if (!removed[v] && bits_test(r, v)) --deg[v];
  }
  return core;
}

// --------------------------------------------------------------------------
// Greedy clique heuristic: from each of the highest-degree seeds, extend
// greedily by max degree inside the shrinking candidate set.
// --------------------------------------------------------------------------

std::vector<int> greedy_clique(const BitGraph& g) {
  const int n = g.n, words = g.words;
  std::vector<int> seeds(n);
  std::iota(seeds.begin(), seeds.end(), 0);
  std::sort(seeds.begin(), seeds.end(),
            [&](int a, int b) { return g.degree(a) > g.degree(b); });
  const int n_seeds = std::min(n, 32);
  std::vector<int> best;
  Bits cand(words);
  for (int s = 0; s < n_seeds; ++s) {
    std::vector<int> clique = {seeds[s]};
    std::copy(g.row(seeds[s]), g.row(seeds[s]) + words, cand.begin());
    while (true) {
      int pick = -1, pickd = -1;
      for (int v = 0; v < n; ++v) {
        if (!bits_test(cand.data(), v)) continue;
        Bits tmp(words);
        bits_and(cand.data(), g.row(v), tmp.data(), words);
        int d = bits_count(tmp.data(), words);
        if (d > pickd) { pickd = d; pick = v; }
      }
      if (pick < 0) break;
      clique.push_back(pick);
      Bits tmp(words);
      bits_and(cand.data(), g.row(pick), tmp.data(), words);
      cand = tmp;
    }
    if (clique.size() > best.size()) best = clique;
  }
  return best;
}

// --------------------------------------------------------------------------
// Exact max clique: branch & bound with greedy colouring bound
// (Tomita-style MCS). Vertices pre-ordered by degeneracy.
// --------------------------------------------------------------------------

struct MaxCliqueSolver {
  const BitGraph& g;
  int n, words;
  std::vector<int> best;
  std::chrono::steady_clock::time_point deadline;
  bool timed_out = false;

  MaxCliqueSolver(const BitGraph& g_, double time_limit_s)
      : g(g_), n(g_.n), words(g_.words),
        deadline(std::chrono::steady_clock::now() +
                 std::chrono::duration_cast<std::chrono::steady_clock::duration>(
                     std::chrono::duration<double>(time_limit_s))) {}

  // Greedy colouring of candidate set P: returns vertices ordered by colour
  // class (ascending) with their colour number (1-based upper bound).
  void colour(const Bits& P, std::vector<int>& verts, std::vector<int>& col) {
    verts.clear();
    col.clear();
    Bits un = P;
    int c = 0;
    Bits avail(words);
    while (bits_count(un.data(), words) > 0) {
      ++c;
      avail = un;
      for (int v = 0; v < n; ++v) {
        if (!bits_test(avail.data(), v)) continue;
        verts.push_back(v);
        col.push_back(c);
        bits_clear(un.data(), v);
        // remove v and its neighbours from this colour class
        bits_clear(avail.data(), v);
        for (int w = 0; w < words; ++w) avail[w] &= ~g.row(v)[w];
      }
    }
  }

  void expand(std::vector<int>& R, Bits& P) {
    if (timed_out) return;
    if (std::chrono::steady_clock::now() > deadline) { timed_out = true; return; }
    std::vector<int> verts, col;
    colour(P, verts, col);
    for (int i = int(verts.size()) - 1; i >= 0; --i) {
      if (int(R.size()) + col[i] <= int(best.size())) return;  // bound
      int v = verts[i];
      R.push_back(v);
      Bits P2(words);
      bits_and(P.data(), g.row(v), P2.data(), words);
      if (bits_count(P2.data(), words) == 0) {
        if (R.size() > best.size()) best = R;
      } else {
        expand(R, P2);
      }
      R.pop_back();
      bits_clear(P.data(), v);
    }
  }

  std::vector<int> solve(const std::vector<int>& seed) {
    best = seed;
    std::vector<int> R;
    Bits P(words, 0);
    for (int v = 0; v < n; ++v) bits_set(P.data(), v);
    expand(R, P);
    return best;
  }
};

// --------------------------------------------------------------------------
// Dinic max-flow specialised for the Goldberg densest-subgraph network:
// source 0, sink n+1, vertex i -> node i+1.
// --------------------------------------------------------------------------

struct Dinic {
  struct Edge { int to; double cap; };
  int n = 0;
  std::vector<Edge> e;             // paired: e[i] and e[i^1] are reverse
  std::vector<std::vector<int>> head;
  std::vector<int> level, it;

  explicit Dinic(int n_) : n(n_), head(n_), level(n_), it(n_) {}

  void add(int u, int v, double cap_uv, double cap_vu) {
    head[u].push_back(int(e.size()));
    e.push_back({v, cap_uv});
    head[v].push_back(int(e.size()));
    e.push_back({u, cap_vu});
  }

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::vector<int> q = {s};
    level[s] = 0;
    for (size_t qi = 0; qi < q.size(); ++qi) {
      int u = q[qi];
      for (int id : head[u]) {
        if (e[id].cap > 1e-12 && level[e[id].to] < 0) {
          level[e[id].to] = level[u] + 1;
          q.push_back(e[id].to);
        }
      }
    }
    return level[t] >= 0;
  }

  double dfs(int u, int t, double f) {
    if (u == t) return f;
    for (int& i = it[u]; i < int(head[u].size()); ++i) {
      int id = head[u][i];
      if (e[id].cap > 1e-12 && level[e[id].to] == level[u] + 1) {
        double d = dfs(e[id].to, t, std::min(f, e[id].cap));
        if (d > 0) {
          e[id].cap -= d;
          e[id ^ 1].cap += d;
          return d;
        }
      }
    }
    return 0;
  }

  double max_flow(int s, int t) {
    double flow = 0;
    while (bfs(s, t)) {
      std::fill(it.begin(), it.end(), 0);
      double f;
      while ((f = dfs(s, t, 1e300)) > 0) flow += f;
    }
    return flow;
  }

  // vertices reachable from s in the residual graph (source side of min cut)
  std::vector<char> min_cut_side(int s) {
    std::vector<char> side(n, 0);
    std::vector<int> q = {s};
    side[s] = 1;
    for (size_t qi = 0; qi < q.size(); ++qi) {
      int u = q[qi];
      for (int id : head[u])
        if (e[id].cap > 1e-12 && !side[e[id].to]) {
          side[e[id].to] = 1;
          q.push_back(e[id].to);
        }
    }
    return side;
  }
};

}  // namespace

extern "C" {

// Maximum clique on an n x n 0/1 adjacency matrix (row-major, diagonal
// ignored). method: 0 = exact B&B, 1 = greedy heuristic, 2 = k-core
// (vertices whose core number equals the max core — the reference's
// Method::KCORE, maxclique.cpp:89-100). Writes clique vertex indices into
// out (capacity n); returns clique size (negated if the exact search
// timed out and returned the incumbent).
int32_t ssg_max_clique(int32_t n, const uint8_t* adj, double time_limit_s,
                       int32_t method, int32_t* out) {
  if (n <= 0) return 0;
  BitGraph g(n);
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      if (adj[size_t(i) * n + j] || adj[size_t(j) * n + i]) g.add_edge(i, j);

  std::vector<int> result;
  bool timed_out = false;
  if (method == 2) {
    std::vector<int> core = core_numbers(g);
    int mx = 0;
    for (int v = 0; v < n; ++v) mx = std::max(mx, core[v]);
    for (int v = 0; v < n; ++v)
      if (core[v] >= mx) result.push_back(v);
  } else {
    result = greedy_clique(g);
    if (method == 0) {
      MaxCliqueSolver solver(g, time_limit_s > 0 ? time_limit_s : 3600.0);
      result = solver.solve(result);
      timed_out = solver.timed_out;
    }
  }
  for (size_t i = 0; i < result.size(); ++i) out[i] = result[i];
  int32_t sz = int32_t(result.size());
  return timed_out ? -sz : sz;
}

// Exact densest subgraph (max over S of total edge weight inside S / |S|)
// via Goldberg's algorithm: binary search on the density g with a min-cut
// feasibility test per step (the reference vendors the same algorithm,
// dsd.cpp:166-270). Edges: m undirected entries (ei[k], ej[k], w[k]),
// weights >= 0. Writes subgraph vertices into out (capacity n); returns
// count; *density receives the achieved density.
int32_t ssg_densest_subgraph(int32_t n, int64_t m, const int32_t* ei,
                             const int32_t* ej, const double* w,
                             int32_t* out, double* density) {
  if (n <= 0) return 0;
  std::vector<double> deg(n, 0.0);
  double W = 0.0;
  for (int64_t k = 0; k < m; ++k) {
    deg[ei[k]] += w[k];
    deg[ej[k]] += w[k];
    W += w[k];
  }
  if (W <= 0) {  // no edges: any single vertex, density 0
    out[0] = 0;
    if (density) *density = 0.0;
    return 1;
  }

  const int s = 0, t = n + 1;
  double lo = 0.0, hi = W;
  std::vector<char> best_side;
  // Goldberg's stopping rule: densities of distinct subgraphs differ by at
  // least 1/(n(n-1)) in the unit-weight case; for real weights iterate to
  // relative precision as well.
  const double gap = 1.0 / (double(n) * std::max(1, n - 1));
  int iters = 0;
  while ((hi - lo) * double(n) * std::max(1, n - 1) >= 1.0 ||
         (iters < 60 && hi - lo > 1e-12 * W)) {
    if (++iters > 200) break;
    double mid = 0.5 * (lo + hi);
    Dinic dinic(n + 2);
    for (int v = 0; v < n; ++v) {
      dinic.add(s, v + 1, W, 0.0);
      dinic.add(v + 1, t, W + 2.0 * mid - deg[v], 0.0);
    }
    for (int64_t k = 0; k < m; ++k)
      dinic.add(ei[k] + 1, ej[k] + 1, w[k], w[k]);
    dinic.max_flow(s, t);
    std::vector<char> side = dinic.min_cut_side(s);
    int cnt = 0;
    for (int v = 0; v < n; ++v) cnt += side[v + 1] ? 1 : 0;
    if (cnt == 0) {
      hi = mid;
    } else {
      lo = mid;
      best_side.assign(side.begin() + 1, side.begin() + 1 + n);
    }
  }
  (void)gap;

  if (best_side.empty()) {  // degenerate: return the max-degree vertex
    int arg = 0;
    for (int v = 1; v < n; ++v)
      if (deg[v] > deg[arg]) arg = v;
    out[0] = arg;
    if (density) *density = 0.0;
    return 1;
  }
  int cnt = 0;
  for (int v = 0; v < n; ++v)
    if (best_side[v]) out[cnt++] = v;
  double inside = 0.0;
  for (int64_t k = 0; k < m; ++k)
    if (best_side[ei[k]] && best_side[ej[k]]) inside += w[k];
  if (density) *density = cnt > 0 ? inside / cnt : 0.0;
  return cnt;
}

}  // extern "C"
