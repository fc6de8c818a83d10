// Spawn-path enumerator: all k-cell self-avoiding paths on an empty
// bordered grid, in the exact order of the Python fallback
// (marlsnake_tpu/core/spawn.py), which itself mirrors the reference DFS
// (core/grid_util.py:73-110): row-major outer sweep, neighbor order
// {(0,1),(1,0),(0,-1),(-1,0)}, and the head-blocked prune.
//
// Build: g++ -O2 -shared -fPIC -o libspawn_enum.so spawn_enum.cpp
//
// API (ctypes):
//   long long enumerate_paths(int height, int width, int k,
//                             int* out /* nullable */, long long capacity);
//   long long enumerate_paths_masked(int height, int width, int k,
//                                    const uint8_t* walls /* nullable */,
//                                    int* out /* nullable */,
//                                    long long capacity);
// With out == nullptr: returns the number of paths.
// With out != nullptr: fills out[n][k][2] (row, col) and returns n
// (paths beyond `capacity` are not written).
// `walls` is an (h*w) row-major byte mask of EXTRA interior walls
// (nonzero = wall) on top of the always-walled border; nullptr = none.

#include <cstdint>
#include <vector>

namespace {

constexpr int SHIFTS[4][2] = {{0, 1}, {1, 0}, {0, -1}, {-1, 0}};

struct Ctx {
  int h, w, k;
  std::vector<uint8_t> mask;   // 1 = empty interior cell
  std::vector<uint8_t> used;   // on current path
  std::vector<int> path;       // r0,c0,r1,c1,...
  int* out;
  long long capacity;
  long long count;

  bool empty_at(int r, int c) const { return mask[r * w + c] != 0; }
  bool used_at(int r, int c) const { return used[r * w + c] != 0; }

  bool head_blocked(int cr, int cc) const {
    // reference core/grid_util.py:102-110: the path head (path[0]) is
    // blocked if all 4 neighbors are wall/non-empty, on the path, or the
    // candidate node being added.
    int hr = path[0], hc = path[1];
    int blocked = 0;
    for (auto& s : SHIFTS) {
      int nr = hr + s[0], nc = hc + s[1];
      if (!empty_at(nr, nc) || used_at(nr, nc) || (nr == cr && nc == cc))
        ++blocked;
    }
    return blocked == 4;
  }

  void emit() {
    if (out && count < capacity) {
      int* dst = out + count * k * 2;
      for (int i = 0; i < k * 2; ++i) dst[i] = path[i];
    }
    ++count;
  }

  void dfs(int r, int c) {
    path.push_back(r);
    path.push_back(c);
    used[r * w + c] = 1;
    if ((int)path.size() == 2 * k) {
      emit();
    } else {
      for (auto& s : SHIFTS) {
        int nr = r + s[0], nc = c + s[1];
        if (nr < 0 || nc < 0 || nr >= h || nc >= w) continue;
        if (!empty_at(nr, nc) || used_at(nr, nc)) continue;
        if (head_blocked(nr, nc)) continue;
        dfs(nr, nc);
      }
    }
    used[r * w + c] = 0;
    path.pop_back();
    path.pop_back();
  }
};

}  // namespace

extern "C" long long enumerate_paths_masked(int height, int width, int k,
                                            const uint8_t* walls, int* out,
                                            long long capacity) {
  if (height < 3 || width < 3 || k < 1) return 0;
  Ctx ctx;
  ctx.h = height;
  ctx.w = width;
  ctx.k = k;
  ctx.out = out;
  ctx.capacity = capacity;
  ctx.count = 0;
  ctx.mask.assign(height * width, 0);
  ctx.used.assign(height * width, 0);
  for (int r = 1; r < height - 1; ++r)
    for (int c = 1; c < width - 1; ++c) {
      int i = r * width + c;
      ctx.mask[i] = (walls && walls[i]) ? 0 : 1;
    }
  ctx.path.reserve(2 * k);
  for (int r = 0; r < height; ++r)
    for (int c = 0; c < width; ++c)
      if (ctx.empty_at(r, c)) ctx.dfs(r, c);
  return ctx.count;
}

extern "C" long long enumerate_paths(int height, int width, int k,
                                     int* out, long long capacity) {
  return enumerate_paths_masked(height, width, k, nullptr, out, capacity);
}
