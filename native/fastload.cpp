// Fast PAMAP2 raw-data loader (native ETL core).
//
// The reference's ETL parses raw whitespace-separated .dat files in Python
// (polars CSV reader, data/preprocess.py:65-96). This is the native
// replacement on the TPU host: a memory-mapped, multithreaded float parser
// that turns a subject file (54 columns, 'NaN' tokens allowed) into a dense
// float32 row-major matrix at ~GB/s, plus a windowing kernel that slices
// sanitized [rows, cols] data into fixed-size zero-padded windows so Python
// never touches per-row loops.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#endif

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
#if defined(__unix__) || defined(__APPLE__)
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
#endif
  return m;
}

void unmap_file(Mapped& m) {
#if defined(__unix__) || defined(__APPLE__)
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
#endif
  m.data = nullptr;
}

// Parse one line of whitespace-separated floats into out[0..n_cols).
// Returns number of fields parsed. Accepts NaN tokens.
inline int parse_line(const char* p, const char* end, float* out, int n_cols) {
  int col = 0;
  while (p < end && col < n_cols) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p >= end || *p == '\n') break;
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) {  // NaN token or garbage; strtof handles "NaN" though
      // skip the token
      while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
      out[col++] = NAN;
      continue;
    }
    out[col++] = v;
    p = next;
  }
  return col;
}

}  // namespace

extern "C" {

// Count newline-terminated lines (rows) in the file. Returns -1 on error.
long pamap2_count_rows(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  long rows = 0;
  const char* p = m.data;
  const char* end = m.data + m.size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) {
      if (end - p > 0) ++rows;  // final unterminated line (even 1 char)
      break;
    }
    ++rows;
    p = nl + 1;
  }
  unmap_file(m);
  return rows;
}

// Parse the whole file into out[rows, n_cols] float32 row-major.
// Missing fields become NaN. Returns rows parsed, or -1 on error,
// -2 if any line has a wrong column count (strict mode).
long pamap2_parse(const char* path, float* out, long max_rows, int n_cols,
                  int strict, int n_threads) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;

  // index line starts
  std::vector<const char*> lines;
  lines.reserve(1 << 16);
  const char* p = m.data;
  const char* end = m.data + m.size;
  while (p < end && (long)lines.size() < max_rows) {
    lines.push_back(p);
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) break;
    p = nl + 1;
  }
  const long rows = (long)lines.size();

  int workers = n_threads > 0 ? n_threads
                              : (int)std::thread::hardware_concurrency();
  if (workers < 1) workers = 1;
  if (workers > rows) workers = (int)rows > 0 ? (int)rows : 1;

  // strtof scans a NUL-terminated C string: when the file ends mid-number
  // with no trailing newline AND the size is an exact multiple of the page
  // size, scanning past `end` would walk off the mapping (SIGSEGV). Copy an
  // unterminated final line into a NUL-terminated buffer and parse that.
  std::string last_line_buf;
  if (rows > 0 && end > m.data && end[-1] != '\n') {
    last_line_buf.assign(lines[rows - 1], end - lines[rows - 1]);
  }

  std::vector<long> bad(workers, 0);
  auto work = [&](int w) {
    long lo = rows * w / workers;
    long hi = rows * (w + 1) / workers;
    for (long r = lo; r < hi; ++r) {
      const char* line = lines[r];
      const char* line_end =
          (r + 1 < rows) ? lines[r + 1] : end;
      if (r == rows - 1 && !last_line_buf.empty()) {
        line = last_line_buf.c_str();
        line_end = line + last_line_buf.size();
      }
      int got = parse_line(line, line_end, out + r * n_cols, n_cols);
      for (int c = got; c < n_cols; ++c) out[r * n_cols + c] = NAN;
      if (strict && got != n_cols) ++bad[w];
    }
  };
  if (workers == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int w = 0; w < workers; ++w) threads.emplace_back(work, w);
    for (auto& t : threads) t.join();
  }
  unmap_file(m);
  long total_bad = 0;
  for (long b : bad) total_bad += b;
  if (strict && total_bad > 0) return -2;
  return rows;
}

// Slice sanitized [rows, n_cols] data into fixed windows with zero padding.
// windows_out shape: [n_windows, window, n_sel]; col_idx selects columns.
// starts/ends give per-window row ranges. NaN/Inf are scrubbed to 0.
void window_gather(const float* data, long n_cols,
                   const long* starts, const long* ends, long n_windows,
                   long window, const long* col_idx, long n_sel,
                   float* windows_out, int n_threads) {
  int workers = n_threads > 0 ? n_threads
                              : (int)std::thread::hardware_concurrency();
  if (workers < 1) workers = 1;
  if (workers > n_windows) workers = n_windows > 0 ? (int)n_windows : 1;
  auto work = [&](int w) {
    long lo = n_windows * w / workers;
    long hi = n_windows * (w + 1) / workers;
    for (long i = lo; i < hi; ++i) {
      float* dst = windows_out + i * window * n_sel;
      long len = ends[i] - starts[i];
      for (long t = 0; t < window; ++t) {
        if (t < len) {
          const float* row = data + (starts[i] + t) * n_cols;
          for (long c = 0; c < n_sel; ++c) {
            float v = row[col_idx[c]];
            dst[t * n_sel + c] = std::isfinite(v) ? v : 0.0f;
          }
        } else {
          memset(dst + t * n_sel, 0, n_sel * sizeof(float));
        }
      }
    }
  };
  if (workers == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int w = 0; w < workers; ++w) threads.emplace_back(work, w);
    for (auto& t : threads) t.join();
  }
}

}  // extern "C"
