// Benchmark driver for the *reference* C++ solver (built out-of-tree against
// /root/reference/deps/admm-elastic-sca). Constructs the identical workload
// to bench.py --preset tet100k: a 40x25x20-cell beam split 5 tets/cell
// (100,000 tets, 22,386 nodes), NeoHookean mu=lambda=1e5 with 5 local
// iterations, one face anchored, gravity, dt=0.04, 10 ADMM iterations.
// Prints ms/step (median) as JSON. This file is ours; it only links the
// reference library for baseline measurement.

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <memory>
#include <vector>

#include "System.hpp"
#include "TetForce.hpp"
#include "AnchorForce.hpp"
#include "ExplicitForce.hpp"

using namespace admm;

int main(int argc, char** argv) {
  int NX = 40, NY = 25, NZ = 20, STEPS = 5;
  double SIZE = 0.05;
  if (argc > 1) STEPS = atoi(argv[1]);
  if (argc > 2) { NX = atoi(argv[2]); NY = atoi(argv[3]); NZ = atoi(argv[4]); }

  const int gx = NX + 1, gy = NY + 1, gz = NZ + 1;
  const int n_nodes = gx * gy * gz;
  auto vid = [&](int i, int j, int k) { return (i * gy + j) * gz + k; };

  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.04;
  system.settings.admm_iters = 10;

  Eigen::VectorXd x(n_nodes * 3), m(n_nodes * 3);
  for (int i = 0; i < gx; ++i)
    for (int j = 0; j < gy; ++j)
      for (int k = 0; k < gz; ++k) {
        int v = vid(i, j, k);
        x[v * 3 + 0] = SIZE * i;
        x[v * 3 + 1] = SIZE * j;
        x[v * 3 + 2] = SIZE * k;
      }
  m.fill(50.0 / n_nodes);
  system.add_nodes(x, m);

  // 5-tet decomposition with alternating parity (same as geometry/primitives)
  const int even[5][4] = {{0,1,2,5},{0,2,3,7},{0,5,7,4},{2,7,5,6},{0,2,5,7}};
  const int odd[5][4]  = {{1,3,0,4},{1,6,2,3},{1,4,6,5},{3,6,4,7},{1,3,4,6}};
  long n_tets = 0;
  for (int i = 0; i < NX; ++i)
    for (int j = 0; j < NY; ++j)
      for (int k = 0; k < NZ; ++k) {
        int c[8] = {vid(i,j,k),     vid(i+1,j,k),     vid(i+1,j+1,k),
                    vid(i,j+1,k),   vid(i,j,k+1),     vid(i+1,j,k+1),
                    vid(i+1,j+1,k+1), vid(i,j+1,k+1)};
        const int (*pat)[4] = ((i + j + k) % 2 == 0) ? even : odd;
        for (int t = 0; t < 5; ++t) {
          std::shared_ptr<Force> f(new HyperElasticTet(
              c[pat[t][0]], c[pat[t][1]], c[pat[t][2]], c[pat[t][3]],
              1e5, 1e5, 5, "nh"));
          system.forces.push_back(f);
          ++n_tets;
        }
      }

  // anchor the x=0 face
  for (int j = 0; j < gy; ++j)
    for (int k = 0; k < gz; ++k) {
      std::shared_ptr<Force> a(new StaticAnchor(vid(0, j, k)));
      system.forces.push_back(a);
    }

  std::shared_ptr<ExplicitForce> gravity(
      new ExplicitForce(Eigen::Vector3d(0, -9.8, 0)));
  system.explicit_forces.push_back(gravity);

  fprintf(stderr, "# %ld tets, %d nodes; initializing (factorization)...\n",
          n_tets, n_nodes);
  auto t0 = std::chrono::steady_clock::now();
  if (!system.initialize()) { fprintf(stderr, "init failed\n"); return 1; }
  auto t1 = std::chrono::steady_clock::now();
  fprintf(stderr, "# initialize: %.1f s\n",
          std::chrono::duration<double>(t1 - t0).count());

  std::vector<double> times;
  for (int s = 0; s < STEPS; ++s) {
    auto a = std::chrono::steady_clock::now();
    system.step();
    auto b = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(b - a).count();
    times.push_back(ms);
    fprintf(stderr, "# step %d: %.1f ms\n", s, ms);
  }
  std::sort(times.begin(), times.end());
  double median = times[times.size() / 2];
  printf("{\"tet100k_ms_per_step\": %.2f, \"n_tets\": %ld, \"steps\": %d}\n",
         median, n_tets, STEPS);
  return 0;
}
