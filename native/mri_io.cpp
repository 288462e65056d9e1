// mri_io: native IO runtime for the TPU DWI super-resolution framework.
//
// The reference loads patient volumes with per-call scipy.io.loadmat on the
// Python main thread (implicit-neural-representations/nn_mri.py:46-54,
// superresDWI.py:40-46), serialising disk IO with training. This library
// provides:
//   * a MATLAB v5 (.mat) reader for numeric arrays, cell arrays, struct
//     arrays and char arrays, including miCOMPRESSED elements (zlib) —
//     the full pat*_alldata.mat / bigImage.mat / master.mat schema set;
//   * a background prefetch pool: N worker threads decode volumes into
//     host buffers while the accelerator trains on the previous patient.
//
// C ABI for ctypes. All returned buffers are owned by the library and
// released with mri_release / mri_prefetch_free.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 mri_io.cpp -o libmri_io.so -lz -lpthread

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// MATLAB v5 parsing
// ---------------------------------------------------------------------------

constexpr uint32_t miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4,
                   miINT32 = 5, miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9,
                   miMATRIX = 14, miCOMPRESSED = 15, miUTF8 = 16,
                   miUTF16 = 17, miUTF32 = 18;

constexpr uint32_t mxDOUBLE_CLASS = 6, mxSINGLE_CLASS = 7, mxINT16_CLASS = 10,
                   mxUINT16_CLASS = 11, mxINT32_CLASS = 12, mxUINT32_CLASS = 13,
                   mxUINT8_CLASS = 9, mxINT8_CLASS = 8, mxCELL_CLASS = 1,
                   mxSTRUCT_CLASS = 2, mxOBJECT_CLASS = 3, mxCHAR_CLASS = 4;

struct Array {
  std::string name;
  std::vector<int64_t> dims;  // column-major dims as stored
  std::vector<double> data;   // converted to double (column-major order)
};

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok() const { return off < n; }
  const uint8_t* at() const { return p + off; }
  // guard against off overshooting n (a final element's 8-byte padding may
  // not be present at EOF) — unsigned subtraction must not underflow
  size_t left() const { return off < n ? n - off : 0; }
};

uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Read one tag; returns (type, size, data_ptr, advance). Handles small-element
// format. The declared payload size is validated against the remaining buffer
// so a truncated/corrupt file fails the parse instead of reading out of
// bounds (the declared size is attacker/corruption-controlled data).
bool read_tag(Cursor& c, uint32_t& type, uint32_t& size, const uint8_t*& data,
              size_t& advance) {
  if (c.left() < 8) return false;
  uint32_t t = rd32(c.at());
  if (t >> 16) {  // small element: size in upper 16 bits of the type word
    size = t >> 16;
    type = t & 0xffff;
    if (size > 4) return false;  // small-element payload lives in the tag
    data = c.at() + 4;
    advance = 8;
  } else {
    type = t;
    size = rd32(c.at() + 4);
    if (size > c.left() - 8) return false;  // payload overruns the buffer
    data = c.at() + 8;
    advance = 8 + ((size + 7) / 8) * 8;  // payload padded to 8 bytes
  }
  return true;
}

template <typename T>
void convert(const uint8_t* src, size_t count, std::vector<double>& out) {
  out.resize(count);
  const T* s = reinterpret_cast<const T*>(src);
  for (size_t i = 0; i < count; ++i) out[i] = static_cast<double>(s[i]);
}

size_t dtype_size(uint32_t t) {
  switch (t) {
    case miINT8:
    case miUINT8:
    case miUTF8: return 1;
    case miINT16:
    case miUINT16:
    case miUTF16: return 2;
    case miINT32:
    case miUINT32:
    case miUTF32:
    case miSINGLE: return 4;
    case miDOUBLE: return 8;
    default: return 0;
  }
}

// Parse one miMATRIX payload. Numeric classes append one Array. A cell array
// of numeric arrays (the master.mat 'hybrid_raw' layout,
// implicit-neural-representations/superresHybrid.py:44-50) appends a marker
// Array "<name>#cell" whose data holds the cell dims, then one
// "<name>#<i>" per cell in column-major order — the Python side reassembles
// an object ndarray from these. Unsupported classes (struct/char/object)
// record a precise note instead of vanishing silently.
bool parse_matrix(const uint8_t* p, size_t n, const std::string& forced_name,
                  std::vector<Array>& arrays, std::string& notes) {
  Cursor c{p, n};
  uint32_t type, size;
  const uint8_t* data;
  size_t adv;

  // array flags
  if (!read_tag(c, type, size, data, adv)) return false;
  if (type != miUINT32 || size < 8) return false;
  uint32_t flags = rd32(data);
  uint32_t cls = flags & 0xff;
  bool is_complex = (flags & 0x0800) != 0;
  c.off += adv;

  // dimensions
  if (!read_tag(c, type, size, data, adv)) return false;
  if (type != miINT32) return false;
  size_t ndim = size / 4;
  std::vector<int64_t> dims(ndim);
  size_t count = 1;
  for (size_t i = 0; i < ndim; ++i) {
    int32_t d;
    std::memcpy(&d, data + 4 * i, 4);
    dims[i] = d;
    count *= static_cast<size_t>(d < 0 ? 0 : d);
  }
  c.off += adv;

  // name (empty for arrays nested inside a cell; the caller supplies one)
  if (!read_tag(c, type, size, data, adv)) return false;
  std::string name(reinterpret_cast<const char*>(data), size);
  if (!forced_name.empty()) name = forced_name;
  c.off += adv;

  if (cls == mxCELL_CLASS) {
    Array marker;
    marker.name = name + "#cell";
    marker.dims = {static_cast<int64_t>(ndim)};
    for (int64_t d : dims) marker.data.push_back(static_cast<double>(d));
    arrays.push_back(std::move(marker));
    for (size_t i = 0; i < count; ++i) {
      if (!read_tag(c, type, size, data, adv) || type != miMATRIX) {
        notes += "truncated cell array '" + name + "'; ";
        return false;
      }
      parse_matrix(data, size, name + "#" + std::to_string(i), arrays, notes);
      c.off += adv;
    }
    return true;
  }
  if (cls == mxSTRUCT_CLASS) {
    // v5 struct layout: field-name length (miINT32), packed field names
    // (miINT8, NUL-padded to the length), then numel x nfields miMATRIX
    // payloads, element-major with fields varying fastest. Encoded for the
    // Python side as a "<name>#struct" marker (data = dims) plus
    // "<name>.<field>#<elem>" entries; native_io._reassemble rebuilds the
    // scipy structured ndarray (pat*_alldata.mat / bigImage.mat schemas,
    // nn_mri.py:29-54, INR_ERD.py:69-95).
    if (!read_tag(c, type, size, data, adv) || type != miINT32 || size < 4) {
      notes += "malformed struct '" + name + "' (field-name length); ";
      return false;
    }
    int32_t flen;
    std::memcpy(&flen, data, 4);
    c.off += adv;
    if (!read_tag(c, type, size, data, adv) || type != miINT8 || flen <= 0) {
      notes += "malformed struct '" + name + "' (field names); ";
      return false;
    }
    size_t nfields = size / static_cast<size_t>(flen);
    std::vector<std::string> fields;
    for (size_t i = 0; i < nfields; ++i) {
      const char* s = reinterpret_cast<const char*>(data) + i * flen;
      fields.emplace_back(s, strnlen(s, flen));
    }
    c.off += adv;

    Array marker;
    marker.name = name + "#struct";
    marker.dims = {static_cast<int64_t>(ndim)};
    for (int64_t d : dims) marker.data.push_back(static_cast<double>(d));
    arrays.push_back(std::move(marker));
    for (size_t e = 0; e < count; ++e) {
      for (size_t f = 0; f < nfields; ++f) {
        if (!read_tag(c, type, size, data, adv) || type != miMATRIX) {
          notes += "truncated struct '" + name + "'; ";
          return false;
        }
        parse_matrix(data, size,
                     name + "." + fields[f] + "#" + std::to_string(e),
                     arrays, notes);
        c.off += adv;
      }
    }
    return true;
  }
  if (cls == mxCHAR_CLASS) {
    // char array: decode the code units to doubles; the Python side turns
    // a "<name>#char" entry back into a str (row-vector) or code grid
    if (!read_tag(c, type, size, data, adv)) return false;
    size_t esz = dtype_size(type);
    if (!esz) {
      notes += "skipped char '" + name + "' (element type " +
               std::to_string(type) + " unsupported); ";
      return false;
    }
    Array out;
    out.name = name + "#char";
    out.dims = std::move(dims);
    size_t n_chars = size / esz;
    switch (type) {
      case miUINT16:
      case miUTF16: convert<uint16_t>(data, n_chars, out.data); break;
      case miUINT8:
      case miUTF8: convert<uint8_t>(data, n_chars, out.data); break;
      case miINT8: convert<int8_t>(data, n_chars, out.data); break;
      case miINT16: convert<int16_t>(data, n_chars, out.data); break;
      case miUTF32: convert<uint32_t>(data, n_chars, out.data); break;
      default:
        notes += "skipped char '" + name + "' (unexpected unit type); ";
        return false;
    }
    arrays.push_back(std::move(out));
    return true;
  }
  if (cls == mxOBJECT_CLASS) {
    notes += "skipped variable '" + name +
             "' (MATLAB class 3 object unsupported by the native reader; "
             "scipy path handles it); ";
    return false;
  }
  if (is_complex) {
    // returning only the real part would silently drop k-space/coil phase
    notes += "skipped variable '" + name +
             "' (complex arrays unsupported by the native reader; "
             "scipy path handles them); ";
    return false;
  }

  // real part
  if (!read_tag(c, type, size, data, adv)) return false;
  size_t esz = dtype_size(type);
  if (!esz) {
    notes += "skipped variable '" + name + "' (element type " +
             std::to_string(type) + " unsupported); ";
    return false;
  }
  Array out;
  out.name = std::move(name);
  out.dims = std::move(dims);
  count = size / esz;
  switch (type) {
    case miDOUBLE: convert<double>(data, count, out.data); break;
    case miSINGLE: convert<float>(data, count, out.data); break;
    case miINT16: convert<int16_t>(data, count, out.data); break;
    case miUINT16: convert<uint16_t>(data, count, out.data); break;
    case miINT32: convert<int32_t>(data, count, out.data); break;
    case miUINT32: convert<uint32_t>(data, count, out.data); break;
    case miINT8: convert<int8_t>(data, count, out.data); break;
    case miUINT8: convert<uint8_t>(data, count, out.data); break;
    default: return false;
  }
  (void)cls;
  arrays.push_back(std::move(out));
  return true;
}

bool inflate_buf(const uint8_t* src, size_t n, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  out.clear();
  // numeric MRI volumes compress ~2:1; reserving 4x avoids almost all
  // reallocation-copies without paging in silly amounts for small files
  out.reserve(n * 4);
  static thread_local std::vector<uint8_t> chunk(1 << 22);  // 4 MB, reused
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(n);
  int ret;
  do {
    zs.next_out = chunk.data();
    zs.avail_out = static_cast<uInt>(chunk.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), chunk.data(), chunk.data() + (chunk.size() - zs.avail_out));
    // keep draining buffered output even after avail_in reaches 0; only a
    // full output chunk or more input can continue the stream
    if (ret == Z_OK && zs.avail_in == 0 && zs.avail_out > 0) {
      inflateEnd(&zs);
      return false;  // truncated stream
    }
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return ret == Z_STREAM_END;
}

bool load_mat(const std::string& path, std::vector<Array>& arrays,
              std::string& err, std::string& notes) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    err = "cannot open " + path;
    return false;
  }
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 128) {
    err = "file too small";
    return false;
  }
  uint16_t version;
  std::memcpy(&version, buf.data() + 124, 2);
  if (version != 0x0100) {
    err = "not a MATLAB v5 file (v7.3/HDF5 goes through the Python h5py path)";
    return false;
  }

  Cursor c{buf.data(), buf.size(), 128};
  while (c.left() >= 8) {
    uint32_t type, size;
    const uint8_t* data;
    size_t adv;
    if (!read_tag(c, type, size, data, adv)) break;
    if (type == miCOMPRESSED) {
      std::vector<uint8_t> raw;
      if (!inflate_buf(data, size, raw)) {
        err = "zlib inflate failed";
        return false;
      }
      Cursor ic{raw.data(), raw.size()};
      uint32_t itype, isize;
      const uint8_t* idata;
      size_t iadv;
      if (read_tag(ic, itype, isize, idata, iadv) && itype == miMATRIX) {
        parse_matrix(idata, isize, "", arrays, notes);
      }
    } else if (type == miMATRIX) {
      parse_matrix(data, size, "", arrays, notes);
    }
    c.off += adv;
  }
  if (arrays.empty()) {
    err = "no numeric arrays found" + (notes.empty() ? "" : ": " + notes);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// handle registry + prefetch pool
// ---------------------------------------------------------------------------

struct Loaded {
  std::vector<Array> arrays;
  std::string err;
  std::string notes;  // precise skip reasons for unsupported variables
  bool ok = false;
  bool done = false;
};

std::mutex g_mu;
std::map<int64_t, std::shared_ptr<Loaded>> g_handles;
int64_t g_next = 1;

struct Pool {
  std::vector<std::thread> workers;
  std::queue<std::pair<int64_t, std::string>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> l(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
  void submit(int64_t h, std::string path) {
    {
      std::lock_guard<std::mutex> l(mu);
      jobs.emplace(h, std::move(path));
    }
    cv.notify_one();
  }
  void run() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> l(mu);
        cv.wait(l, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop();
      }
      std::shared_ptr<Loaded> slot;
      {
        std::lock_guard<std::mutex> l(g_mu);
        slot = g_handles[job.first];
      }
      // decode into locals so every write to the shared slot happens under
      // g_mu — accessors read ok/arrays under the same mutex, and unlocked
      // writes here raced with them (UB on a partially-built vector)
      std::vector<Array> arrays;
      std::string err, notes;
      bool ok = load_mat(job.second, arrays, err, notes);
      {
        std::lock_guard<std::mutex> l(g_mu);
        slot->arrays = std::move(arrays);
        slot->err = std::move(err);
        slot->notes = std::move(notes);
        slot->ok = ok;
        slot->done = true;
      }
    }
  }
};

std::unique_ptr<Pool> g_pool;

}  // namespace

extern "C" {

// Synchronous load. Returns handle > 0 or 0 on failure.
int64_t mri_load(const char* path) {
  auto slot = std::make_shared<Loaded>();
  slot->ok = load_mat(path, slot->arrays, slot->err, slot->notes);
  slot->done = true;
  if (!slot->ok) return 0;
  std::lock_guard<std::mutex> l(g_mu);
  int64_t h = g_next++;
  g_handles[h] = slot;
  return h;
}

// Async prefetch: returns a handle immediately; poll with mri_ready.
int64_t mri_prefetch(const char* path, int num_threads) {
  std::lock_guard<std::mutex> l(g_mu);
  if (!g_pool) g_pool = std::make_unique<Pool>(num_threads > 0 ? num_threads : 4);
  int64_t h = g_next++;
  g_handles[h] = std::make_shared<Loaded>();
  g_pool->submit(h, path);
  return h;
}

int mri_ready(int64_t handle) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end()) return -1;
  if (!it->second->done) return 0;
  return it->second->ok ? 1 : -2;
}

int mri_num_arrays(int64_t handle) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end() || !it->second->ok) return -1;
  return static_cast<int>(it->second->arrays.size());
}

// Copies the array name into name_buf; returns name length or -1.
int mri_array_name(int64_t handle, int index, char* name_buf, int buf_len) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end() || index >= (int)it->second->arrays.size()) return -1;
  const auto& name = it->second->arrays[index].name;
  int n = std::min<int>(buf_len - 1, name.size());
  std::memcpy(name_buf, name.data(), n);
  name_buf[n] = 0;
  return static_cast<int>(name.size());
}

int mri_array_ndim(int64_t handle, int index) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end() || index >= (int)it->second->arrays.size()) return -1;
  return static_cast<int>(it->second->arrays[index].dims.size());
}

int mri_array_dims(int64_t handle, int index, int64_t* dims_out) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end() || index >= (int)it->second->arrays.size()) return -1;
  const auto& d = it->second->arrays[index].dims;
  for (size_t i = 0; i < d.size(); ++i) dims_out[i] = d[i];
  return static_cast<int>(d.size());
}

// Copies the column-major double data into out (caller allocates).
int64_t mri_array_data(int64_t handle, int index, double* out, int64_t capacity) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end() || index >= (int)it->second->arrays.size()) return -1;
  const auto& a = it->second->arrays[index];
  if ((int64_t)a.data.size() > capacity) return -2;
  std::memcpy(out, a.data.data(), a.data.size() * sizeof(double));
  return static_cast<int64_t>(a.data.size());
}

void mri_release(int64_t handle) {
  std::lock_guard<std::mutex> l(g_mu);
  g_handles.erase(handle);
}

// Copies skip-notes (unsupported-variable reasons) into buf; returns the
// full length of the notes string, or -1 for a bad handle.
int mri_notes(int64_t handle, char* buf, int buf_len) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_handles.find(handle);
  if (it == g_handles.end()) return -1;
  const auto& notes = it->second->notes;
  int n = std::min<int>(buf_len - 1, notes.size());
  std::memcpy(buf, notes.data(), n);
  buf[n] = 0;
  return static_cast<int>(notes.size());
}

const char* mri_version() { return "mri_io 0.3.0"; }

}  // extern "C"
