// TSan stress: concurrent prefetch of many volumes + concurrent polling
#include <cstdio>
#include <cstdint>
#include <vector>
#include <thread>
extern "C" {
  int64_t mri_prefetch(const char*, int);
  int mri_ready(int64_t);
  int mri_num_arrays(int64_t);
  void mri_release(int64_t);
}
int main() {
  const char* paths[] = {
    "/root/reference/anon_data/pat07_mean_b0.mat",
    "/root/reference/anon_data/pat08_mean_b0.mat",
    "/root/reference/anon_data/pat09_mean_b0.mat",
    "/root/reference/anon_data/pat30_mean_b0.mat",
  };
  std::vector<int64_t> handles;
  for (int rep = 0; rep < 3; ++rep)
    for (auto p : paths) handles.push_back(mri_prefetch(p, 4));
  // concurrent pollers
  std::vector<std::thread> pollers;
  for (int t = 0; t < 4; ++t)
    pollers.emplace_back([&] {
      for (auto h : handles)
        while (mri_ready(h) == 0) std::this_thread::yield();
    });
  for (auto& t : pollers) t.join();
  int ok = 0;
  for (auto h : handles) { if (mri_num_arrays(h) == 1) ++ok; mri_release(h); }
  printf("prefetched ok: %d/%zu\n", ok, handles.size());
  return 0;
}
