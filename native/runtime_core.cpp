// Native runtime core: measurement queues + scheduler + wire codec.
//
// The reference's runtime layer is C++ (Input/InputManager/Robot queues,
// inputNode.cpp + input.cpp + robot.cpp; databaseManager serialization via
// ROS messages). This library is the TPU-native framework's equivalent: a
// lock-protected ring of timestamped measurements with the exact
// PickNextMeasurementToAdd discipline (input.cpp:26-109), and a compact
// binary codec for PoseMstBundle-equivalent packets so inter-robot payloads
// can cross real sockets without Python in the hot path.
//
// Exposed as a C API consumed via ctypes (slide_slam_tpu/native.py).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 runtime_core.cpp -o libslideslam_runtime.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct StampedPose {
  double stamp;
  float pose[7];  // qw qx qy qz tx ty tz
};

struct Observation {
  double stamp;
  float pose[7];
  int64_t payload;  // opaque handle back into Python
};

struct RelativeMeas {
  double stamp;
  float pose[7];
  int64_t payload;
  int32_t robot_index;
  int32_t only_use_odom;
};

struct Queues {
  std::deque<StampedPose> odom;
  std::deque<Observation> obs;
  std::deque<RelativeMeas> rel;
  StampedPose latest_odom{-1e300, {1, 0, 0, 0, 0, 0, 0}};
  bool latest_valid = false;
  size_t max_odom = 2000;
  size_t max_obs = 200;
  std::mutex mu;
};

inline double translation_dist(const float a[7], const float b[7]) {
  // ||trans(a^-1 b)|| == ||t_b - t_a|| (rotation preserves norm)
  const double dx = double(b[4]) - a[4];
  const double dy = double(b[5]) - a[5];
  const double dz = double(b[6]) - a[6];
  return std::sqrt(dx * dx + dy * dy + dz * dz);
}

}  // namespace

extern "C" {

void* ssq_create(int max_odom, int max_obs) {
  auto* q = new Queues();
  q->max_odom = max_odom;
  q->max_obs = max_obs;
  return q;
}

void ssq_destroy(void* h) { delete static_cast<Queues*>(h); }

void ssq_push_odom(void* h, double stamp, const float* pose) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  StampedPose s;
  s.stamp = stamp;
  std::memcpy(s.pose, pose, sizeof(s.pose));
  q->odom.push_back(s);
  while (q->odom.size() > q->max_odom) q->odom.pop_front();
}

void ssq_push_observation(void* h, double stamp, const float* pose,
                          int64_t payload) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  Observation o;
  o.stamp = stamp;
  std::memcpy(o.pose, pose, sizeof(o.pose));
  o.payload = payload;
  q->obs.push_back(o);
  while (q->obs.size() > q->max_obs) q->obs.pop_front();
}

void ssq_push_relative(void* h, double stamp, const float* pose,
                       int64_t payload, int robot_index, int only_use_odom) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  RelativeMeas r;
  r.stamp = stamp;
  std::memcpy(r.pose, pose, sizeof(r.pose));
  r.payload = payload;
  r.robot_index = robot_index;
  r.only_use_odom = only_use_odom;
  q->rel.push_back(r);
}

void ssq_set_latest_odom(void* h, double stamp, const float* pose) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  q->latest_odom.stamp = stamp;
  std::memcpy(q->latest_odom.pose, pose, sizeof(q->latest_odom.pose));
  q->latest_valid = true;
}

// PickNextMeasurementToAdd (input.cpp:26-109).
// Returns 0 none / 1 odometry / 2 observation / 3 relative, and fills
// out_stamp / out_pose / out_payload for the selected front entry
// (without popping it — call ssq_pop_front(kind) after consuming).
int ssq_pick_next(void* h, double current_time, double msg_delay_tolerance,
                  double min_odom_distance, double* out_stamp,
                  float* out_pose, int64_t* out_payload,
                  int32_t* out_robot_index, int32_t* out_only_use_odom) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  const double latest = q->latest_valid ? q->latest_odom.stamp : -1e300;

  while (!q->odom.empty() && q->odom.front().stamp < latest) q->odom.pop_front();
  while (!q->obs.empty() && q->obs.front().stamp < latest) q->obs.pop_front();
  while (!q->rel.empty() && q->rel.front().stamp < latest) q->rel.pop_front();

  const bool valid_obs =
      !q->obs.empty() &&
      (current_time - q->obs.front().stamp) >= msg_delay_tolerance;
  const bool valid_rel =
      !q->rel.empty() &&
      (current_time - q->rel.front().stamp) >= msg_delay_tolerance;

  auto fill_obs = [&]() {
    *out_stamp = q->obs.front().stamp;
    std::memcpy(out_pose, q->obs.front().pose, 7 * sizeof(float));
    *out_payload = q->obs.front().payload;
  };
  auto fill_rel = [&]() {
    *out_stamp = q->rel.front().stamp;
    std::memcpy(out_pose, q->rel.front().pose, 7 * sizeof(float));
    *out_payload = q->rel.front().payload;
    *out_robot_index = q->rel.front().robot_index;
    *out_only_use_odom = q->rel.front().only_use_odom;
  };

  if (valid_obs && valid_rel) {
    if (q->obs.front().stamp < q->rel.front().stamp) { fill_obs(); return 2; }
    fill_rel();
    return 3;
  }
  if (valid_obs) { fill_obs(); return 2; }
  if (valid_rel) { fill_rel(); return 3; }

  for (int i = int(q->odom.size()) - 1; i >= 0; --i) {
    if ((current_time - q->odom[i].stamp) >= msg_delay_tolerance) {
      const double moved =
          q->latest_valid
              ? translation_dist(q->latest_odom.pose, q->odom[i].pose)
              : 1e300;
      if (moved > min_odom_distance) {
        for (int j = 0; j < i; ++j) q->odom.pop_front();
        *out_stamp = q->odom.front().stamp;
        std::memcpy(out_pose, q->odom.front().pose, 7 * sizeof(float));
        *out_payload = -1;
        return 1;
      }
      break;
    }
  }
  return 0;
}

void ssq_pop_front(void* h, int kind) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  if (kind == 1 && !q->odom.empty()) q->odom.pop_front();
  if (kind == 2 && !q->obs.empty()) q->obs.pop_front();
  if (kind == 3 && !q->rel.empty()) q->rel.pop_front();
}

int ssq_sizes(void* h, int* odom, int* obs, int* rel) {
  auto* q = static_cast<Queues*>(h);
  std::lock_guard<std::mutex> lk(q->mu);
  *odom = int(q->odom.size());
  *obs = int(q->obs.size());
  *rel = int(q->rel.size());
  return 0;
}

// ---------------------------------------------------------------------------
// Wire codec for PoseMstBundle-equivalent packets.
//
// Layout per packet (little-endian):
//   f64 stamp | f32 key_pose[7] | f32 rel_odom[7]
//   u32 n_cyl | n_cyl * (f32 root[3] ray[3] radius, i32 label)
//   u32 n_cub | n_cub * (f32 pose[7] scale[3], i32 label)
//   u32 n_ell | n_ell * (f32 pose[7] scale[3], i32 label)
// ---------------------------------------------------------------------------

static size_t packet_size(uint32_t nc, uint32_t nk, uint32_t ne) {
  return 8 + 7 * 4 + 7 * 4 + 4 + nc * (7 * 4 + 4) + 4 + nk * (10 * 4 + 4) +
         4 + ne * (10 * 4 + 4);
}

int64_t ssc_encode_packet(double stamp, const float* key_pose,
                          const float* rel_odom, int n_cyl,
                          const float* cyl_data, const int32_t* cyl_label,
                          int n_cub, const float* cub_data,
                          const int32_t* cub_label, int n_ell,
                          const float* ell_data, const int32_t* ell_label,
                          uint8_t* out, int64_t out_capacity) {
  const size_t need = packet_size(n_cyl, n_cub, n_ell);
  if (int64_t(need) > out_capacity) return -int64_t(need);
  uint8_t* p = out;
  auto put = [&](const void* src, size_t n) { std::memcpy(p, src, n); p += n; };
  put(&stamp, 8);
  put(key_pose, 7 * 4);
  put(rel_odom, 7 * 4);
  uint32_t n = n_cyl;
  put(&n, 4);
  for (int i = 0; i < n_cyl; ++i) {
    put(cyl_data + i * 7, 7 * 4);
    put(cyl_label + i, 4);
  }
  n = n_cub;
  put(&n, 4);
  for (int i = 0; i < n_cub; ++i) {
    put(cub_data + i * 10, 10 * 4);
    put(cub_label + i, 4);
  }
  n = n_ell;
  put(&n, 4);
  for (int i = 0; i < n_ell; ++i) {
    put(ell_data + i * 10, 10 * 4);
    put(ell_label + i, 4);
  }
  return int64_t(p - out);
}

// Decode: returns consumed bytes, fills counts; caller then calls
// ssc_decode_arrays with adequately sized buffers.
int64_t ssc_packet_counts(const uint8_t* buf, int64_t len, int32_t* n_cyl,
                          int32_t* n_cub, int32_t* n_ell) {
  if (len < 8 + 56) return -1;
  const uint8_t* p = buf + 8 + 56;
  uint32_t nc, nk, ne;
  std::memcpy(&nc, p, 4);
  p += 4 + nc * 32;
  std::memcpy(&nk, p, 4);
  p += 4 + nk * 44;
  std::memcpy(&ne, p, 4);
  p += 4 + ne * 44;
  if (p - buf > len) return -1;
  *n_cyl = nc;
  *n_cub = nk;
  *n_ell = ne;
  return p - buf;
}

int64_t ssc_decode_packet(const uint8_t* buf, int64_t len, double* stamp,
                          float* key_pose, float* rel_odom, float* cyl_data,
                          int32_t* cyl_label, float* cub_data,
                          int32_t* cub_label, float* ell_data,
                          int32_t* ell_label) {
  const uint8_t* p = buf;
  auto get = [&](void* dst, size_t n) { std::memcpy(dst, p, n); p += n; };
  get(stamp, 8);
  get(key_pose, 28);
  get(rel_odom, 28);
  uint32_t n;
  get(&n, 4);
  for (uint32_t i = 0; i < n; ++i) {
    get(cyl_data + i * 7, 28);
    get(cyl_label + i, 4);
  }
  get(&n, 4);
  for (uint32_t i = 0; i < n; ++i) {
    get(cub_data + i * 10, 40);
    get(cub_label + i, 4);
  }
  get(&n, 4);
  for (uint32_t i = 0; i < n; ++i) {
    get(ell_data + i * 10, 40);
    get(ell_label + i, 4);
  }
  return p - buf;
}

}  // extern "C"
