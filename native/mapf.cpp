// Native MAPF backend: PIBT on a 4-connected grid.
//
// C++ re-implementation of lsc_dr_planner_tpu/mapf/pibt.py (which is the
// behavioral reference mirroring the vendored mapf-IR PIBT,
// reference: src/mapf/pibt.cpp). The host-side MAPF layer is the only
// inherently sequential component of the planner; at large fleet sizes
// Python overhead dominates, so the simulator prefers this backend via
// ctypes (lsc_dr_planner_tpu/mapf/native.py), falling back to Python.
//
// Determinism contract: candidate shuffles use the same LCG +
// Fisher–Yates as the Python implementation (pibt.py::Lcg), so both
// backends produce bit-identical plans.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

struct Lcg {
  uint32_t s;
  explicit Lcg(uint32_t seed) : s(seed * 2654435761u + 1u) {}
  uint32_t next() {
    s = s * 1664525u + 1013904223u;
    return s;
  }
  template <typename T>
  void shuffle(std::vector<T>& xs) {
    for (int i = static_cast<int>(xs.size()) - 1; i > 0; --i) {
      int j = static_cast<int>(next() % static_cast<uint32_t>(i + 1));
      std::swap(xs[i], xs[j]);
    }
  }
};

constexpr int kInf = 1 << 29;
const int kDx[4] = {-1, 1, 0, 0};
const int kDy[4] = {0, 0, -1, 1};

struct Agent {
  int id;
  int v_now;
  int v_next;  // -1 = undecided
  int goal;
  int elapsed;
  int init_d;
  double tie;
};

struct Solver {
  int X, Y, n;
  const uint8_t* occ;
  std::vector<std::vector<int>> dist;  // [agent][cell] BFS dist to goal
  std::vector<Agent> agents;
  std::vector<int> occupied_now;   // cell -> agent idx or -1
  std::vector<int> occupied_next;  // cell -> agent idx or -1
  Lcg rng;

  Solver(const uint8_t* occ_, int X_, int Y_, int n_, uint32_t seed)
      : X(X_), Y(Y_), n(n_), occ(occ_),
        occupied_now(X_ * Y_, -1), occupied_next(X_ * Y_, -1), rng(seed) {}

  inline int cell(int x, int y) const { return x * Y + y; }
  inline bool free_cell(int x, int y) const {
    return x >= 0 && x < X && y >= 0 && y < Y && !occ[cell(x, y)];
  }

  void bfs(int goal, std::vector<int>& d) const {
    d.assign(X * Y, kInf);
    if (occ[goal]) return;
    std::deque<int> q;
    d[goal] = 0;
    q.push_back(goal);
    while (!q.empty()) {
      int c = q.front();
      q.pop_front();
      int x = c / Y, y = c % Y;
      for (int k = 0; k < 4; ++k) {
        int nx = x + kDx[k], ny = y + kDy[k];
        if (!free_cell(nx, ny)) continue;
        int nc = cell(nx, ny);
        if (d[c] + 1 < d[nc]) {
          d[nc] = d[c] + 1;
          q.push_back(nc);
        }
      }
    }
  }

  int choose_node(const Agent& a) {
    std::vector<int> cands;
    int x = a.v_now / Y, y = a.v_now % Y;
    for (int k = 0; k < 4; ++k) {
      // neighbor order matches pibt.py's _NBR4: (-1,0),(1,0),(0,-1),(0,1)
      int nx = x + kDx[k], ny = y + kDy[k];
      if (free_cell(nx, ny)) cands.push_back(cell(nx, ny));
    }
    cands.push_back(a.v_now);
    rng.shuffle(cands);
    int best = -1;
    const std::vector<int>& dd = dist[a.id];
    for (int u : cands) {
      if (occupied_next[u] >= 0) continue;
      int aj = occupied_now[u];
      if (aj >= 0 && agents[aj].v_next == a.v_now) continue;  // swap
      if (u == a.goal) return u;
      if (best < 0) {
        best = u;
      } else {
        int cu = dd[u], cv = dd[best];
        if (cu < cv ||
            (cu == cv && occupied_now[best] >= 0 && occupied_now[u] < 0)) {
          best = u;
        }
      }
    }
    return best;
  }

  bool func_pibt(Agent& a) {
    while (true) {
      int v = choose_node(a);
      if (v < 0) {
        occupied_next[a.v_now] = a.id;
        a.v_next = a.v_now;
        return false;
      }
      occupied_next[v] = a.id;
      a.v_next = v;
      int aj = occupied_now[v];
      if (aj >= 0 && aj != a.id && agents[aj].v_next < 0) {
        if (!func_pibt(agents[aj])) {
          a.v_next = -1;  // abandoned reservation stays (see pibt.py)
          continue;
        }
      }
      return true;
    }
  }
};

}  // namespace

extern "C" {

// Fill out (X*Y ints) with BFS distances to (gx, gy) on occ.
void bfs_table(const uint8_t* occ, int X, int Y, int gx, int gy, int* out) {
  Solver s(occ, X, Y, 0, 0);
  std::vector<int> d;
  s.bfs(s.cell(gx, gy), d);
  std::copy(d.begin(), d.end(), out);
}


// Returns the solution length L (configs per agent, including the start
// entry), or -1 on failure. out_paths must hold n * max_len * 2 ints.
// dist_in: optional precomputed BFS distance tables [n][X*Y] (row i =
// distances to agent i's goal on this exact occupancy); nullptr =
// compute internally. Tables are cached host-side because they are the
// dominant cost at large n (1024 agents x 8k cells ~ 400 ms/solve).
int pibt_solve(const uint8_t* occ, int X, int Y, const int* starts,
               const int* currents, const int* goals,
               const int* init_elapsed, int n, int seed, int max_timestep,
               int* out_paths, int max_len, const int* dist_in) {
  Solver s(occ, X, Y, n, static_cast<uint32_t>(seed));
  s.dist.resize(n);
  s.agents.resize(n);
  for (int i = 0; i < n; ++i) {
    int g = s.cell(goals[2 * i], goals[2 * i + 1]);
    if (dist_in) {
      s.dist[i].assign(dist_in + static_cast<size_t>(i) * X * Y,
                       dist_in + static_cast<size_t>(i + 1) * X * Y);
    } else {
      s.bfs(g, s.dist[i]);
    }
    int v = s.cell(currents[2 * i], currents[2 * i + 1]);
    if (s.dist[i][v] >= kInf) return -1;  // unreachable
    Agent& a = s.agents[i];
    a.id = i;
    a.v_now = v;
    a.v_next = -1;
    a.goal = g;
    a.elapsed = init_elapsed ? init_elapsed[i] : 0;
    a.init_d = s.dist[i][v];
    a.tie = static_cast<double>(i) / n;
    s.occupied_now[v] = i;
  }

  // solution[t][i] cells; t=0 is the mission-start config (pibt.cpp:44)
  std::vector<std::vector<int>> solution;
  {
    std::vector<int> cfg(n);
    for (int i = 0; i < n; ++i) cfg[i] = s.cell(starts[2 * i], starts[2 * i + 1]);
    solution.push_back(cfg);
  }

  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;

  bool solved = false;
  for (int t = 0; t < max_timestep; ++t) {
    // priority: (elapsed, init_d, tie) descending — stable sort
    std::vector<int> ord = order;
    for (size_t i = 1; i < ord.size(); ++i) {  // insertion sort (stable)
      int key = ord[i];
      size_t j = i;
      auto higher = [&](int a, int b) {
        const Agent &A = s.agents[a], &B = s.agents[b];
        if (A.elapsed != B.elapsed) return A.elapsed > B.elapsed;
        if (A.init_d != B.init_d) return A.init_d > B.init_d;
        return A.tie > B.tie;
      };
      while (j > 0 && higher(key, ord[j - 1])) {
        ord[j] = ord[j - 1];
        --j;
      }
      ord[j] = key;
    }
    for (int idx : ord) {
      Agent& a = s.agents[idx];
      if (a.v_next < 0) s.func_pibt(a);
    }
    std::vector<int> cfg(n);
    bool all_goal = true;
    std::fill(s.occupied_now.begin(), s.occupied_now.end(), -1);
    for (int i = 0; i < n; ++i) {
      Agent& a = s.agents[i];
      cfg[i] = a.v_next;
      s.occupied_now[a.v_next] = i;
      all_goal = all_goal && (a.v_next == a.goal);
      a.elapsed = (a.v_next == a.goal) ? 0 : a.elapsed + 1;
      a.v_now = a.v_next;
      a.v_next = -1;
    }
    std::fill(s.occupied_next.begin(), s.occupied_next.end(), -1);
    solution.push_back(cfg);
    if (all_goal) {
      solved = true;
      break;
    }
  }
  if (!solved) return -1;

  // strip the repeated all-agent prefix
  int repeated = 0;
  int L = static_cast<int>(solution.size());
  for (int t = 1; t < L; ++t) {
    bool rep = true;
    for (int i = 0; i < n; ++i) {
      if (solution[0][i] != solution[t][i]) {
        rep = false;
        break;
      }
    }
    if (rep) repeated = t;
  }
  L -= repeated;
  if (L > max_len) L = max_len;
  for (int i = 0; i < n; ++i) {
    for (int t = 0; t < L; ++t) {
      int c = solution[t + repeated][i];
      out_paths[(i * max_len + t) * 2] = c / Y;
      out_paths[(i * max_len + t) * 2 + 1] = c % Y;
    }
  }
  return L;
}
}
