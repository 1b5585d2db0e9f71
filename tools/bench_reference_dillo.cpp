// Benchmark driver for the *reference* C++ solver on the poordillo mesh —
// the per-scenario cost of bench.py --preset sweep64 (64 parallel
// hyperelastic drops). The reference has no batch facility: a sweep is N
// sequential runs, so the sweep baseline is N x this ms/step. Workload
// matches bench.py bench_sweep(): dillo919 scaled by 0.01, uniform mass
// 140/n, top-8 vertices anchored, NeoHookean mu=lambda=1e5 with 5 local
// iterations, gravity, dt=0.06, 10 ADMM iterations. This file is ours; it
// only links the reference library for baseline measurement.

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <memory>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

#include "System.hpp"
#include "TetForce.hpp"
#include "AnchorForce.hpp"
#include "ExplicitForce.hpp"

using namespace admm;

int main(int argc, char** argv) {
  int STEPS = 10;
  std::string base = "/root/reference/samples/poordillo/dillo919";
  if (argc > 1) STEPS = atoi(argv[1]);
  if (argc > 2) base = argv[2];

  // ---- .node loader (tetgen ascii, 1-index autodetect)
  std::ifstream nf(base + ".node");
  if (!nf) { fprintf(stderr, "missing %s.node\n", base.c_str()); return 1; }
  long nv = 0, dim = 0, na = 0, nb = 0;
  nf >> nv >> dim >> na >> nb;
  std::vector<double> verts(nv * 3);
  std::vector<long> ids(nv);
  for (long i = 0; i < nv; ++i) {
    nf >> ids[i] >> verts[i * 3] >> verts[i * 3 + 1] >> verts[i * 3 + 2];
    for (long a = 0; a < na + nb; ++a) { double tmp; nf >> tmp; }
  }
  long off = ids[0];  // 0- or 1-indexed

  std::ifstream ef(base + ".ele");
  if (!ef) { fprintf(stderr, "missing %s.ele\n", base.c_str()); return 1; }
  long nt = 0, npt = 0, nea = 0;
  ef >> nt >> npt >> nea;
  std::vector<long> tets(nt * 4);
  for (long e = 0; e < nt; ++e) {
    long id;
    ef >> id;
    for (int k = 0; k < 4; ++k) { ef >> tets[e * 4 + k]; tets[e * 4 + k] -= off; }
    for (long a = 0; a < nea; ++a) { double tmp; ef >> tmp; }
  }

  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.06;
  system.settings.admm_iters = 10;

  Eigen::VectorXd x(nv * 3), m(nv * 3);
  for (long i = 0; i < nv * 3; ++i) x[i] = verts[i] * 0.01;
  m.fill(140.0 / double(nv));
  system.add_nodes(x, m);

  for (long e = 0; e < nt; ++e) {
    std::shared_ptr<Force> f(new HyperElasticTet(
        int(tets[e * 4]), int(tets[e * 4 + 1]), int(tets[e * 4 + 2]),
        int(tets[e * 4 + 3]), 1e5, 1e5, 5, "nh"));
    system.forces.push_back(f);
  }

  // anchor the top-8 vertices by y (matches bench_sweep)
  std::vector<long> order(nv);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](long a, long b) {
    return verts[a * 3 + 1] < verts[b * 3 + 1];
  });
  for (long i = nv - 8; i < nv; ++i) {
    std::shared_ptr<Force> a(new StaticAnchor(int(order[i])));
    system.forces.push_back(a);
  }

  std::shared_ptr<ExplicitForce> gravity(
      new ExplicitForce(Eigen::Vector3d(0, -9.8, 0)));
  system.explicit_forces.push_back(gravity);

  fprintf(stderr, "# %ld tets, %ld nodes; initializing...\n", nt, nv);
  if (!system.initialize()) { fprintf(stderr, "init failed\n"); return 1; }

  system.step();  // warmup
  std::vector<double> times;
  for (int s = 0; s < STEPS; ++s) {
    auto t0 = std::chrono::steady_clock::now();
    system.step();
    auto t1 = std::chrono::steady_clock::now();
    times.push_back(
        std::chrono::duration<double, std::milli>(t1 - t0).count());
    fprintf(stderr, "# step %d: %.2f ms\n", s, times.back());
  }
  std::sort(times.begin(), times.end());
  double med = times[times.size() / 2];
  printf("{\"dillo_ms_per_step\": %.2f, \"n_tets\": %ld, \"steps\": %d}\n",
         med, nt, STEPS);
  return 0;
}
