#include <cstdio>
#include <cstdint>
extern "C" {
  int64_t mri_load(const char*);
  int mri_num_arrays(int64_t);
  int mri_array_name(int64_t, int, char*, int);
  int mri_array_ndim(int64_t, int);
  const char* mri_version();
}
int main() {
  printf("%s\n", mri_version());
  int64_t h = mri_load("/root/reference/anon_data/pat07_mean_b0.mat");
  printf("handle: %ld\n", (long)h);
  if (h) {
    printf("arrays: %d\n", mri_num_arrays(h));
    char name[256];
    mri_array_name(h, 0, name, 256);
    printf("name: %s ndim %d\n", name, mri_array_ndim(h, 0));
  }
  return 0;
}
