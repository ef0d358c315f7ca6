// Sequential double-precision physics oracle for FutbolEnv parity tests.
//
// This is the TPU framework's replacement for the role Chipmunk2D's C core
// plays in the reference (SURVEY.md §2.2): a native, sequential,
// single-env implementation of the NORMATIVE PHYSICS SPEC in
// gym_futbol_tpu/physics.py (module docstring). It is written from that
// spec — not from Chipmunk or pymunk sources — and must match the JAX
// engine bit-closely in float64 (parity harness: parity/check_physics_parity.py,
// SURVEY.md §4.2 item 1). Any change to the spec must land in both.
//
// Build: g++ -O2 -shared -fPIC -o liboracle.so oracle.cpp   (native/build.py)
// ABI: plain C, driven via ctypes.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Params {
  double width, height, goal_size;
  double player_radius, ball_radius;
  double player_mass, ball_mass;
  double player_elasticity, ball_elasticity, wall_elasticity;
  double friction;
  double dt;
  double substeps;          // integral value
  double damping;
  double solver_iterations; // integral value
  double collision_slop;
  double baumgarte;
  double max_speed;
};

struct V2 {
  double x, y;
};

inline V2 operator+(V2 a, V2 b) { return {a.x + b.x, a.y + b.y}; }
inline V2 operator-(V2 a, V2 b) { return {a.x - b.x, a.y - b.y}; }
inline V2 operator*(V2 a, double s) { return {a.x * s, a.y * s}; }
inline double dot(V2 a, V2 b) { return a.x * b.x + a.y * b.y; }

// One sub-step of the spec. pos/vel length n (bodies); body 0 = ball.
void substep(std::vector<V2>& pos, std::vector<V2>& vel,
             const std::vector<V2>& forces, const Params& p) {
  const int n = static_cast<int>(pos.size());
  const double dt_sub = p.dt / p.substeps;
  const int iters = static_cast<int>(p.solver_iterations);

  std::vector<double> inv_m(n), radii(n), elas(n);
  inv_m[0] = 1.0 / p.ball_mass;
  radii[0] = p.ball_radius;
  elas[0] = p.ball_elasticity;
  for (int i = 1; i < n; ++i) {
    inv_m[i] = 1.0 / p.player_mass;
    radii[i] = p.player_radius;
    elas[i] = p.player_elasticity;
  }

  // ---- spec item 1: velocity integration -------------------------------
  const double damp = std::pow(p.damping, dt_sub);
  for (int i = 0; i < n; ++i) {
    V2 v = vel[i] * damp + forces[i] * (inv_m[i] * dt_sub);
    double speed = std::sqrt(v.x * v.x + v.y * v.y);
    double scale = std::fmin(1.0, p.max_speed / std::fmax(speed, 1e-12));
    vel[i] = v * scale;
  }

  // ---- spec item 2: contact generation ----------------------------------
  const double goal_y_lo = (p.height - p.goal_size) / 2.0;
  const double goal_y_hi = (p.height + p.goal_size) / 2.0;
  const double bias_coef = p.baumgarte / dt_sub;

  struct CC {
    int i, j;
    double active;
    V2 nrm, tan;
    double kn, bounce, vbias;
  };
  std::vector<CC> cc;
  cc.reserve(n * (n - 1) / 2);
  for (int i = 0; i < n; ++i) {
    for (int j = i + 1; j < n; ++j) {
      V2 dp = pos[j] - pos[i];
      double dist = std::sqrt(dp.x * dp.x + dp.y * dp.y);
      double pen = (radii[i] + radii[j]) - dist;
      CC c;
      c.i = i;
      c.j = j;
      c.active = pen > 0.0 ? 1.0 : 0.0;
      double inv_d = 1.0 / std::fmax(dist, 1e-12);
      c.nrm = dp * inv_d;
      c.tan = {-c.nrm.y, c.nrm.x};
      c.kn = 1.0 / (inv_m[i] + inv_m[j]);
      double e = elas[i] * elas[j];
      double vrn0 = dot(vel[j] - vel[i], c.nrm);
      c.bounce = e * std::fmin(vrn0, 0.0);
      c.vbias = bias_coef * std::fmax(pen - p.collision_slop, 0.0);
      cc.push_back(c);
    }
  }

  // walls: order [bottom, top, left, right]; normals point into the field
  const V2 wall_n[4] = {{0, 1}, {0, -1}, {1, 0}, {-1, 0}};
  std::vector<double> w_active(4 * n), w_bounce(4 * n), w_vbias(4 * n);
  for (int i = 0; i < n; ++i) {
    bool ball_in_mouth =
        (i == 0) && pos[i].y >= goal_y_lo && pos[i].y <= goal_y_hi;
    double d[4];
    d[0] = radii[i] - pos[i].y;
    d[1] = radii[i] - (p.height - pos[i].y);
    d[2] = ball_in_mouth ? -1.0 : radii[i] - pos[i].x;
    d[3] = ball_in_mouth ? -1.0 : radii[i] - (p.width - pos[i].x);
    double e = elas[i] * p.wall_elasticity;
    for (int w = 0; w < 4; ++w) {
      w_active[w * n + i] = d[w] > 0.0 ? 1.0 : 0.0;
      double vrn0 = dot(vel[i], wall_n[w]);
      w_bounce[w * n + i] = e * std::fmin(vrn0, 0.0);
      w_vbias[w * n + i] =
          bias_coef * std::fmax(d[w] - p.collision_slop, 0.0);
    }
  }

  // ---- spec item 3: impulse solve ---------------------------------------
  std::vector<double> jn_cc(cc.size(), 0.0), jt_cc(cc.size(), 0.0);
  std::vector<double> jn_w(4 * n, 0.0), jt_w(4 * n, 0.0);

  for (int it = 0; it < iters; ++it) {
    // circle–circle, sequential in fixed lexicographic order
    for (size_t k = 0; k < cc.size(); ++k) {
      const CC& c = cc[k];
      double vrn = dot(vel[c.j] - vel[c.i], c.nrm);
      double dj = -c.kn * (vrn + c.bounce - c.vbias);
      double jn_new = std::fmax(jn_cc[k] + dj, 0.0);
      dj = (jn_new - jn_cc[k]) * c.active;
      jn_cc[k] += dj;
      V2 dv = c.nrm * dj;
      vel[c.i] = vel[c.i] - dv * inv_m[c.i];
      vel[c.j] = vel[c.j] + dv * inv_m[c.j];
      // friction
      double vrt = dot(vel[c.j] - vel[c.i], c.tan);
      double djt = -c.kn * vrt;
      double lim = p.friction * jn_cc[k];
      double jt_new = jt_cc[k] + djt;
      jt_new = std::fmin(std::fmax(jt_new, -lim), lim);
      djt = (jt_new - jt_cc[k]) * c.active;
      jt_cc[k] += djt;
      dv = c.tan * djt;
      vel[c.i] = vel[c.i] - dv * inv_m[c.i];
      vel[c.j] = vel[c.j] + dv * inv_m[c.j];
    }

    // walls: per-wall, per-body (independent bodies => same math as the
    // JAX vectorized pass)
    for (int w = 0; w < 4; ++w) {
      const V2 nw = wall_n[w];
      const V2 tw = {-nw.y, nw.x};
      for (int i = 0; i < n; ++i) {
        double kn = 1.0 / inv_m[i];
        double m = w_active[w * n + i];
        double vrn = dot(vel[i], nw);
        double dj = -kn * (vrn + w_bounce[w * n + i] - w_vbias[w * n + i]);
        double jn_new = std::fmax(jn_w[w * n + i] + dj, 0.0);
        dj = (jn_new - jn_w[w * n + i]) * m;
        jn_w[w * n + i] += dj;
        vel[i] = vel[i] + nw * (dj * inv_m[i]);
        double vrt = dot(vel[i], tw);
        double djt = -kn * vrt;
        double lim = p.friction * jn_w[w * n + i];
        double jt_new = jt_w[w * n + i] + djt;
        jt_new = std::fmin(std::fmax(jt_new, -lim), lim);
        djt = (jt_new - jt_w[w * n + i]) * m;
        jt_w[w * n + i] += djt;
        vel[i] = vel[i] + tw * (djt * inv_m[i]);
      }
    }
  }

  // ---- spec item 4: position integration --------------------------------
  for (int i = 0; i < n; ++i) {
    pos[i] = pos[i] + vel[i] * dt_sub;
  }
}

}  // namespace

extern "C" {

// pos, vel, forces: [n_bodies * 2] row-major doubles. params: Params layout.
void futbol_physics_step(double* pos, double* vel, const double* forces,
                         int n_bodies, const double* params) {
  const Params& p = *reinterpret_cast<const Params*>(params);
  std::vector<V2> P(n_bodies), V(n_bodies), F(n_bodies);
  for (int i = 0; i < n_bodies; ++i) {
    P[i] = {pos[2 * i], pos[2 * i + 1]};
    V[i] = {vel[2 * i], vel[2 * i + 1]};
    F[i] = {forces[2 * i], forces[2 * i + 1]};
  }
  const int substeps = static_cast<int>(p.substeps);
  for (int s = 0; s < substeps; ++s) {
    substep(P, V, F, p);
  }
  for (int i = 0; i < n_bodies; ++i) {
    pos[2 * i] = P[i].x;
    pos[2 * i + 1] = P[i].y;
    vel[2 * i] = V[i].x;
    vel[2 * i + 1] = V[i].y;
  }
}

int futbol_oracle_abi_version() { return 1; }

}  // extern "C"
