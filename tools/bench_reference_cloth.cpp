// Benchmark driver for the *reference* C++ solver on the WINDYFLAG
// workload (built out-of-tree against /root/reference/deps/admm-elastic-sca;
// this file is ours, it only links the reference library for baseline
// measurement). Constructs the identical configuration to
// bench.py --preset windyflag: a 30x20 sym-plane cloth (1,251 nodes,
// 2,400 triangles, scaled 0.75 like cloth.xml), LimitedTriangleStrain
// k=100 limits [.95,1.05] per face, BendForce k=20 per unique hinge,
// two corner StaticAnchors, gravity, WindForce over all faces with
// direction (10,0,2), density-weighted masses summing to 0.5,
// dt=0.04, 30 ADMM iterations. Prints ms/step (median) as JSON.

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <map>
#include <memory>
#include <set>
#include <utility>
#include <vector>

#include "System.hpp"
#include "TriangleForce.hpp"
#include "BendForce.hpp"
#include "AnchorForce.hpp"
#include "ExplicitForce.hpp"

using namespace admm;

int main(int argc, char** argv) {
  int W = 30, H = 20, STEPS = 20;
  if (argc > 1) STEPS = atoi(argv[1]);
  const double SCALE = 0.75;

  // sym plane on [-1,1]^2 (geometry/primitives.make_sym_plane layout:
  // grid verts x-major, then quad centers), scaled like the scene xform
  const int n_grid = (W + 1) * (H + 1);
  const int n_nodes = n_grid + W * H;
  std::vector<double> vx(3 * n_nodes);
  for (int x = 0; x <= W; ++x)
    for (int y = 0; y <= H; ++y) {
      int v = x * (H + 1) + y;
      vx[3 * v + 0] = SCALE * (-1.0 + 2.0 * x / W);
      vx[3 * v + 1] = SCALE * (-1.0 + 2.0 * y / H);
      vx[3 * v + 2] = 0.0;
    }
  for (int x = 0; x < W; ++x)
    for (int y = 0; y < H; ++y) {
      int v = n_grid + x * H + y;
      vx[3 * v + 0] = SCALE * (-1.0 + 2.0 * x / W + 1.0 / W);
      vx[3 * v + 1] = SCALE * (-1.0 + 2.0 * y / H + 1.0 / H);
      vx[3 * v + 2] = 0.0;
    }
  std::vector<int> faces;  // flat (F,3)
  for (int x = 0; x < W; ++x)
    for (int y = 0; y < H; ++y) {
      int ll = y + x * (H + 1);
      int lr = y + (x + 1) * (H + 1);
      int ul = ll + 1, ur = lr + 1;
      int c = n_grid + x * H + y;
      int q[12] = {ll, lr, c, lr, ur, c, c, ur, ul, ll, c, ul};
      for (int i = 0; i < 12; ++i) faces.push_back(q[i]);
    }
  const int n_faces = (int)faces.size() / 3;

  // density-weighted mass lumping (area/3 per corner, normalized to 0.5)
  std::vector<double> lump(n_nodes, 0.0);
  double total = 0.0;
  for (int f = 0; f < n_faces; ++f) {
    const int* t = &faces[3 * f];
    Eigen::Vector3d p0(vx[3 * t[0]], vx[3 * t[0] + 1], vx[3 * t[0] + 2]);
    Eigen::Vector3d p1(vx[3 * t[1]], vx[3 * t[1] + 1], vx[3 * t[1] + 2]);
    Eigen::Vector3d p2(vx[3 * t[2]], vx[3 * t[2] + 1], vx[3 * t[2] + 2]);
    double area = 0.5 * ((p1 - p0).cross(p2 - p0)).norm();
    for (int k = 0; k < 3; ++k) lump[t[k]] += area / 3.0;
    total += area;
  }

  System system;
  system.settings.verbose = 0;
  system.settings.timestep_s = 0.04;
  system.settings.admm_iters = 30;

  Eigen::VectorXd x(3 * n_nodes), m(3 * n_nodes);
  for (int v = 0; v < n_nodes; ++v)
    for (int a = 0; a < 3; ++a) {
      x[3 * v + a] = vx[3 * v + a];
      m[3 * v + a] = 0.5 * lump[v] / total;
    }
  system.add_nodes(x, m);

  for (int f = 0; f < n_faces; ++f)
    system.forces.push_back(std::make_shared<LimitedTriangleStrain>(
        faces[3 * f], faces[3 * f + 1], faces[3 * f + 2], 100.0, 0.95,
        1.05));

  // unique hinges in Volino ordering (wing0, wing1, edge0, edge1) —
  // the same emission the XML ForceBuilder produces
  std::map<std::pair<int, int>, std::pair<int, int>> edge2face;  // edge -> (face, wing)
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
        // hinge (x0=this wing, x1=other wing, x2=p[(c+2)%3], x3=p[(c+1)%3])
        system.forces.push_back(std::make_shared<BendForce>(
            t[c], it->second.second, t[(c + 2) % 3], t[(c + 1) % 3],
            20.0));
        ++n_bend;
      }
    }
  }

  // two corner pins (bench.py: index_offset + 0 and + length)
  system.forces.push_back(std::make_shared<StaticAnchor>(0));
  system.forces.push_back(std::make_shared<StaticAnchor>(H));

  system.explicit_forces.push_back(
      std::make_shared<ExplicitForce>(Eigen::Vector3d(0, -9.8, 0)));
  auto wind = std::make_shared<WindForce>(faces);
  wind->direction = Eigen::Vector3d(10.0, 0.0, 2.0);
  system.explicit_forces.push_back(wind);

  if (!system.initialize()) {
    fprintf(stderr, "initialize failed\n");
    return 1;
  }
  fprintf(stderr, "# windyflag ref: %d nodes, %d tris, %d hinges\n",
          n_nodes, n_faces, n_bend);

  system.step();  // warm
  std::vector<double> times;
  for (int s = 0; s < STEPS; ++s) {
    auto t0 = std::chrono::high_resolution_clock::now();
    system.step();
    auto t1 = std::chrono::high_resolution_clock::now();
    times.push_back(
        std::chrono::duration<double, std::milli>(t1 - t0).count());
  }
  std::sort(times.begin(), times.end());
  printf("{\"windyflag_ms_per_step\": %.3f}\n", times[times.size() / 2]);
  return 0;
}
