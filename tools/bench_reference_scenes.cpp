// Benchmark driver for the *reference* C++ solver on the remaining bundled
// scene workloads — bunny (bunnyexpand physics), plinko (plinkopony
// physics), and cloth100k (the 225x225 production-scale cloth). Built
// out-of-tree against /root/reference/deps/admm-elastic-sca; this file is
// ours, it only links the reference library for baseline measurement.
// Each mode constructs the IDENTICAL configuration to the matching
// bench.py preset (see bench.py build_scene_preset / build_cloth100k), so
// the ms/step numbers are apples-to-apples:
//   bunny:     bunny_1124 at rest + gravity, StVK mu=lambda=100, 5 local
//              iters, uniform mass 1, dt=0.04, 10 ADMM iters
//   plinko:    horse759 *1.4 +(0,6,0), LinearTetStrain k=1e5, gravity,
//              CollisionForce with 23 z-cylinders (r=0.4, staggered peg
//              rows), uniform mass 2, dt=0.04, 13 ADMM iters
//   cloth100k: 225x225 plane grid (101,250 tris), LimitedTriangleStrain
//              k=100 [.95,1.05], BendForce k=20 per unique hinge, 26 top
//              anchors, gravity + wind (4,0,1), uniform mass 0.5,
//              dt=0.04, 10 ADMM iters
// Usage: bench_reference_scenes <bunny|plinko|cloth100k> [steps]

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <numeric>
#include <set>
#include <string>
#include <utility>
#include <vector>

#include "System.hpp"
#include "TetForce.hpp"
#include "TriangleForce.hpp"
#include "BendForce.hpp"
#include "AnchorForce.hpp"
#include "ExplicitForce.hpp"
#include "CollisionForce.hpp"
#include "CollisionCylinder.hpp"

using namespace admm;

static bool load_node_ele(const std::string& base, std::vector<double>& verts,
                          std::vector<long>& tets) {
  std::ifstream nf(base + ".node");
  if (!nf) return false;
  long nv = 0, dim = 0, na = 0, nb = 0;
  nf >> nv >> dim >> na >> nb;
  verts.resize(nv * 3);
  std::vector<long> ids(nv);
  for (long i = 0; i < nv; ++i) {
    nf >> ids[i] >> verts[i * 3] >> verts[i * 3 + 1] >> verts[i * 3 + 2];
    for (long a = 0; a < na + nb; ++a) { double tmp; nf >> tmp; }
  }
  long off = ids[0];
  std::ifstream ef(base + ".ele");
  if (!ef) return false;
  long nt = 0, npt = 0, nea = 0;
  ef >> nt >> npt >> nea;
  tets.resize(nt * 4);
  for (long e = 0; e < nt; ++e) {
    long id;
    ef >> id;
    for (int k = 0; k < 4; ++k) { ef >> tets[e * 4 + k]; tets[e * 4 + k] -= off; }
    for (long a = 0; a < nea; ++a) { double tmp; ef >> tmp; }
  }
  return true;
}

static double run_steps(System& system, int steps, const char* label) {
  if (!system.initialize()) { fprintf(stderr, "init failed\n"); exit(1); }
  system.step();  // warmup
  std::vector<double> times;
  for (int s = 0; s < steps; ++s) {
    auto t0 = std::chrono::steady_clock::now();
    system.step();
    auto t1 = std::chrono::steady_clock::now();
    times.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
    fprintf(stderr, "# %s step %d: %.2f ms\n", label, s, times.back());
  }
  std::sort(times.begin(), times.end());
  return times[times.size() / 2];
}

static int bench_bunny(int steps) {
  std::vector<double> verts; std::vector<long> tets;
  if (!load_node_ele("/root/reference/samples/bunnyexpand/bunny_1124",
                     verts, tets)) { fprintf(stderr, "no bunny mesh\n"); return 1; }
  long nv = (long)verts.size() / 3, nt = (long)tets.size() / 4;
  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.04;
  system.settings.admm_iters = 10;
  Eigen::VectorXd x(nv * 3), m(nv * 3);
  for (long i = 0; i < nv * 3; ++i) x[i] = verts[i];
  m.fill(1.0 / double(nv));
  system.add_nodes(x, m);
  for (long e = 0; e < nt; ++e)
    system.forces.push_back(std::make_shared<HyperElasticTet>(
        int(tets[e * 4]), int(tets[e * 4 + 1]), int(tets[e * 4 + 2]),
        int(tets[e * 4 + 3]), 100.0, 100.0, 5, "stvk"));
  system.explicit_forces.push_back(
      std::make_shared<ExplicitForce>(Eigen::Vector3d(0, -9.8, 0)));
  fprintf(stderr, "# bunny: %ld nodes %ld tets\n", nv, nt);
  double med = run_steps(system, steps, "bunny");
  printf("{\"bunny_ms_per_step\": %.3f}\n", med);
  return 0;
}

static int bench_plinko(int steps) {
  std::vector<double> verts; std::vector<long> tets;
  if (!load_node_ele("/root/reference/samples/plinkopony/horse759",
                     verts, tets)) { fprintf(stderr, "no horse mesh\n"); return 1; }
  long nv = (long)verts.size() / 3, nt = (long)tets.size() / 4;
  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.04;
  system.settings.admm_iters = 13;
  Eigen::VectorXd x(nv * 3), m(nv * 3);
  for (long i = 0; i < nv; ++i) {
    x[i * 3 + 0] = verts[i * 3 + 0] * 1.4;
    x[i * 3 + 1] = verts[i * 3 + 1] * 1.4 + 6.0;
    x[i * 3 + 2] = verts[i * 3 + 2] * 1.4;
  }
  m.fill(2.0 / double(nv));
  system.add_nodes(x, m);
  for (long e = 0; e < nt; ++e)
    system.forces.push_back(std::make_shared<LinearTetStrain>(
        int(tets[e * 4]), int(tets[e * 4 + 1]), int(tets[e * 4 + 2]),
        int(tets[e * 4 + 3]), 1e5));
  // 23 pegs in 5 staggered rows (samples/plinkopony.py _peg_grid)
  std::vector<std::shared_ptr<CollisionShape>> shapes;
  for (int row = 0; row < 5 && (int)shapes.size() < 23; ++row) {
    double y = 0.5 + row * 1.5;
    std::vector<double> xs = (row % 2 == 0)
        ? std::vector<double>{-3.0, -1.5, 0.0, 1.5, 3.0}
        : std::vector<double>{-2.25, -0.75, 0.75, 2.25};
    for (double px : xs) {
      if ((int)shapes.size() >= 23) break;
      shapes.push_back(std::make_shared<CollisionCylinder>(
          Eigen::Vector3d(px, y, 0), Eigen::Vector3d(1, 1, 1), 0.4));
    }
  }
  system.forces.push_back(std::make_shared<CollisionForce>(shapes));
  system.explicit_forces.push_back(
      std::make_shared<ExplicitForce>(Eigen::Vector3d(0, -9.8, 0)));
  fprintf(stderr, "# plinko: %ld nodes %ld tets %zu cyls\n", nv, nt,
          shapes.size());
  double med = run_steps(system, steps, "plinko");
  printf("{\"plinko_ms_per_step\": %.3f}\n", med);
  return 0;
}

static int bench_cloth100k(int steps) {
  // make_plane_grid(225, 225) layout: (nx+1)x(ny+1) grid verts, x-major
  // (vid = i*gy + j), two tris per quad along a consistent diagonal
  const int NX = 225, NY = 225;
  const int gx = NX + 1, gy = NY + 1, n_nodes = gx * gy;
  std::vector<double> vx(3 * n_nodes);
  for (int i = 0; i < gx; ++i)
    for (int j = 0; j < gy; ++j) {
      int v = i * gy + j;
      vx[3 * v + 0] = -1.0 + 2.0 * i / NX;
      vx[3 * v + 1] = -1.0 + 2.0 * j / NY;
      vx[3 * v + 2] = 0.0;
    }
  std::vector<int> faces;
  for (int i = 0; i < NX; ++i)
    for (int j = 0; j < NY; ++j) {
      int a = i * gy + j, b = (i + 1) * gy + j;
      int c = (i + 1) * gy + j + 1, d = i * gy + j + 1;
      int q[6] = {a, b, c, a, c, d};
      for (int k = 0; k < 6; ++k) faces.push_back(q[k]);
    }
  const int n_faces = (int)faces.size() / 3;

  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.04;
  system.settings.admm_iters = 10;
  Eigen::VectorXd x(3 * n_nodes), m(3 * n_nodes);
  for (int v = 0; v < 3 * n_nodes; ++v) x[v] = vx[v];
  m.fill(0.5 / double(n_nodes));
  system.add_nodes(x, m);

  for (int f = 0; f < n_faces; ++f)
    system.forces.push_back(std::make_shared<LimitedTriangleStrain>(
        faces[3 * f], faces[3 * f + 1], faces[3 * f + 2], 100.0, 0.95, 1.05));

  // unique hinges (same emission as bench_reference_cloth.cpp)
  std::map<std::pair<int, int>, std::pair<int, int>> edge2face;
  std::set<std::pair<int, int>> seen;
  int n_bend = 0;
  for (int f = 0; f < n_faces; ++f) {
    const int* t = &faces[3 * f];
    for (int c = 0; c < 3; ++c) {
      int e0 = t[(c + 1) % 3], e1 = t[(c + 2) % 3];
      auto key = std::make_pair(std::min(e0, e1), std::max(e0, e1));
      auto it = edge2face.find(key);
      if (it == edge2face.end()) {
        edge2face[key] = std::make_pair(f, t[c]);
      } else if (!seen.count(key)) {
        seen.insert(key);
        system.forces.push_back(std::make_shared<BendForce>(
            t[c], it->second.second, t[(c + 2) % 3], t[(c + 1) % 3], 20.0));
        ++n_bend;
      }
    }
  }

  // top-row anchors: j = gy-1, every max(1, n_top/24)-th (bench.py
  // build_cloth100k: top[::max(1, len(top)//24)])
  int stride = gx / 24 > 0 ? gx / 24 : 1;
  int n_anchor = 0;
  for (int i = 0; i < gx; i += stride) {
    system.forces.push_back(
        std::make_shared<StaticAnchor>(i * gy + (gy - 1)));
    ++n_anchor;
  }

  system.explicit_forces.push_back(
      std::make_shared<ExplicitForce>(Eigen::Vector3d(0, -9.8, 0)));
  auto wind = std::make_shared<WindForce>(faces);
  wind->direction = Eigen::Vector3d(4.0, 0.0, 1.0);
  system.explicit_forces.push_back(wind);

  fprintf(stderr, "# cloth100k: %d nodes %d tris %d hinges %d anchors\n",
          n_nodes, n_faces, n_bend, n_anchor);
  double med = run_steps(system, steps, "cloth100k");
  printf("{\"cloth100k_ms_per_step\": %.3f}\n", med);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s <bunny|plinko|cloth100k> [steps]\n", argv[0]); return 1; }
  int steps = argc > 2 ? atoi(argv[2]) : 10;
  if (!strcmp(argv[1], "bunny")) return bench_bunny(steps);
  if (!strcmp(argv[1], "plinko")) return bench_plinko(steps);
  if (!strcmp(argv[1], "cloth100k")) return bench_cloth100k(steps);
  fprintf(stderr, "unknown mode %s\n", argv[1]);
  return 1;
}
