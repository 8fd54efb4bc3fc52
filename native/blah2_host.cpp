// blah2_tpu native host runtime.
//
// Native-speed equivalents of the reference's C++ host components, exposed
// through a C ABI for ctypes:
//
//   * SPSC IQ ring buffer — the capture/process coupling the reference
//     implements as a mutexed per-sample deque (src/data/IqData.cpp:42-63),
//     rebuilt as a block-oriented ring of complex<float> with drop-oldest
//     overwrite and condition-variable blocking push/pop.
//   * Replay file reader/writer — the int16-quad interleaved record format
//     (i1,q1,i2,q2) of src/capture/rspduo/RspDuo.cpp:150-179 (reader) and
//     RspDuo.cpp:523-535 (writer), converted vectorized.
//   * Chunked TCP sender — the JSON egress contract of
//     src/process/utility/Socket.cpp:21-32 (1024-byte chunks).
//
// Build: make -C native   (produces libblah2host.so)

#include <algorithm>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Ring buffer of complex64 samples (stored as interleaved float pairs).
// ---------------------------------------------------------------------------

struct B2Ring {
  float *buf;          // 2*capacity floats
  int64_t capacity;    // samples
  int64_t start;       // oldest sample index
  int64_t len;         // samples stored
  int64_t dropped;     // total samples dropped (overflow), monotonic
  bool closed;
  std::mutex mu;
  std::condition_variable not_empty;
  std::condition_variable not_full;
};

B2Ring *b2_ring_create(int64_t capacity) {
  auto *r = new B2Ring();
  r->buf = new float[2 * capacity];
  r->capacity = capacity;
  r->start = 0;
  r->len = 0;
  r->closed = false;
  return r;
}

void b2_ring_destroy(B2Ring *r) {
  if (!r) return;
  delete[] r->buf;
  delete r;
}

void b2_ring_close(B2Ring *r) {
  std::lock_guard<std::mutex> g(r->mu);
  r->closed = true;
  r->not_empty.notify_all();
  r->not_full.notify_all();
}

int64_t b2_ring_len(B2Ring *r) {
  std::lock_guard<std::mutex> g(r->mu);
  return r->len;
}

// Total samples dropped to overflow since creation (seam detection for
// overlapped CPI extraction).
int64_t b2_ring_dropped(B2Ring *r) {
  std::lock_guard<std::mutex> g(r->mu);
  return r->dropped;
}

// Copy n samples into the ring at the write head (caller holds the lock).
static void ring_write(B2Ring *r, const float *iq, int64_t n) {
  int64_t end = (r->start + r->len) % r->capacity;
  int64_t first = std::min(n, r->capacity - end);
  std::memcpy(r->buf + 2 * end, iq, 2 * first * sizeof(float));
  if (n > first)
    std::memcpy(r->buf, iq + 2 * first, 2 * (n - first) * sizeof(float));
  int64_t overflow = std::max<int64_t>(0, r->len + n - r->capacity);
  r->start = (r->start + overflow) % r->capacity;
  r->len = std::min(r->len + n, r->capacity);
  r->dropped += overflow;
}

// Push, dropping the oldest samples on overflow (IqData.cpp:42-53 semantics).
void b2_ring_push(B2Ring *r, const float *iq, int64_t n) {
  int64_t trunc = 0;
  if (n > r->capacity) {           // keep only the newest capacity samples
    iq += 2 * (n - r->capacity);
    trunc = n - r->capacity;
    n = r->capacity;
  }
  std::lock_guard<std::mutex> g(r->mu);
  r->dropped += trunc;
  ring_write(r, iq, n);
  r->not_empty.notify_all();
}

// Push, blocking until the block fits. Returns 1 on success, 0 on
// timeout/closed (replay pacing, RspDuo.cpp:169-178).
int b2_ring_push_wait(B2Ring *r, const float *iq, int64_t n,
                      double timeout_s) {
  std::unique_lock<std::mutex> g(r->mu);
  auto pred = [&] { return r->capacity - r->len >= n || r->closed; };
  if (timeout_s < 0) {
    r->not_full.wait(g, pred);
  } else if (!r->not_full.wait_for(
                 g, std::chrono::duration<double>(timeout_s), pred)) {
    return 0;
  }
  if (r->closed) return 0;
  ring_write(r, iq, n);
  r->not_empty.notify_all();
  return 1;
}

// Block until at least n samples are available (no consumption).
// Returns 1 when available, 0 on timeout or closed-and-short.
int b2_ring_wait_len(B2Ring *r, int64_t n, double timeout_s) {
  std::unique_lock<std::mutex> g(r->mu);
  auto pred = [&] { return r->len >= n || r->closed; };
  if (timeout_s < 0) {
    r->not_empty.wait(g, pred);
  } else if (!r->not_empty.wait_for(
                 g, std::chrono::duration<double>(timeout_s), pred)) {
    return 0;
  }
  return r->len >= n ? 1 : 0;
}

// Pop the oldest n samples into out. Returns 1 on success, 0 on
// timeout/closed-and-short.
int b2_ring_pop(B2Ring *r, float *out, int64_t n, double timeout_s) {
  std::unique_lock<std::mutex> g(r->mu);
  auto pred = [&] { return r->len >= n || r->closed; };
  if (timeout_s < 0) {
    r->not_empty.wait(g, pred);
  } else if (!r->not_empty.wait_for(
                 g, std::chrono::duration<double>(timeout_s), pred)) {
    return 0;
  }
  if (r->len < n) return 0;
  int64_t first = std::min(n, r->capacity - r->start);
  std::memcpy(out, r->buf + 2 * r->start, 2 * first * sizeof(float));
  if (n > first)
    std::memcpy(out + 2 * first, r->buf, 2 * (n - first) * sizeof(float));
  r->start = (r->start + n) % r->capacity;
  r->len -= n;
  r->not_full.notify_all();
  return 1;
}

// ---------------------------------------------------------------------------
// Replay file reader: int16 quads (i1,q1,i2,q2) -> two interleaved-float
// complex channels.
// ---------------------------------------------------------------------------

struct B2Replay {
  FILE *f;
};

B2Replay *b2_replay_open(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto *r = new B2Replay();
  r->f = f;
  return r;
}

void b2_replay_close(B2Replay *r) {
  if (!r) return;
  std::fclose(r->f);
  delete r;
}

void b2_replay_rewind(B2Replay *r) { std::rewind(r->f); }

// Read up to max_samples quads; writes interleaved float IQ into ch1/ch2.
// Returns samples read (0 on EOF). Partial trailing quads are dropped, as
// in the reference's record-sized fread loop (RspDuo.cpp:158-166).
int64_t b2_replay_read(B2Replay *r, float *ch1, float *ch2,
                       int64_t max_samples) {
  const int64_t kBlock = 65536;
  static thread_local int16_t tmp[4 * kBlock];
  int64_t total = 0;
  while (total < max_samples) {
    int64_t want = std::min(kBlock, max_samples - total);
    size_t got = std::fread(tmp, 4 * sizeof(int16_t), want, r->f);
    for (size_t i = 0; i < got; i++) {
      ch1[2 * (total + i)] = static_cast<float>(tmp[4 * i]);
      ch1[2 * (total + i) + 1] = static_cast<float>(tmp[4 * i + 1]);
      ch2[2 * (total + i)] = static_cast<float>(tmp[4 * i + 2]);
      ch2[2 * (total + i) + 1] = static_cast<float>(tmp[4 * i + 3]);
    }
    total += got;
    if (got < static_cast<size_t>(want)) break;  // EOF or partial quad
  }
  return total;
}

// Append n samples of both channels to an IQ record file as int16 quads.
// Returns 1 on success.
int b2_record_append(const char *path, const float *ch1, const float *ch2,
                     int64_t n) {
  FILE *f = std::fopen(path, "ab");
  if (!f) return 0;
  const int64_t kBlock = 65536;
  static thread_local int16_t tmp[4 * kBlock];
  auto clamp16 = [](float v) -> int16_t {
    return static_cast<int16_t>(std::max(-32768.0f, std::min(32767.0f, v)));
  };
  for (int64_t off = 0; off < n; off += kBlock) {
    int64_t m = std::min(kBlock, n - off);
    for (int64_t i = 0; i < m; i++) {
      tmp[4 * i] = clamp16(ch1[2 * (off + i)]);
      tmp[4 * i + 1] = clamp16(ch1[2 * (off + i) + 1]);
      tmp[4 * i + 2] = clamp16(ch2[2 * (off + i)]);
      tmp[4 * i + 3] = clamp16(ch2[2 * (off + i) + 1]);
    }
    if (std::fwrite(tmp, 4 * sizeof(int16_t), m, f) !=
        static_cast<size_t>(m)) {
      std::fclose(f);
      return 0;
    }
  }
  std::fclose(f);
  return 1;
}

// ---------------------------------------------------------------------------
// Fast JSON number formatting for the big products (delay-Doppler map body,
// spectrum): 2-decimal values, trailing zeros trimmed — the wire format of
// the reference's rapidjson SetMaxDecimalPlaces(2) (src/data/Map.cpp:158).
// Serializing a 301x411 map via Python json.dumps costs ~100 ms per CPI;
// this does it in a few ms.
// ---------------------------------------------------------------------------

// Write one value as [-]ddd[.dd] with <=2 decimals, trailing zeros trimmed.
static inline char *fmt2(char *p, double v) {
  if (!(v == v) || v > 1e18 || v < -1e18) {  // nan/inf -> 0.0 (round2 parity)
    *p++ = '0';
    return p;
  }
  if (v < 0) {
    *p++ = '-';
    v = -v;
  }
  // round to 2 decimals (half away from zero, like printf)
  long long cents = static_cast<long long>(v * 100.0 + 0.5);
  long long whole = cents / 100;
  int frac = static_cast<int>(cents % 100);
  // integer part
  char tmp[24];
  int n = 0;
  do {
    tmp[n++] = static_cast<char>('0' + whole % 10);
    whole /= 10;
  } while (whole);
  while (n) *p++ = tmp[--n];
  if (frac) {
    *p++ = '.';
    *p++ = static_cast<char>('0' + frac / 10);
    if (frac % 10) *p++ = static_cast<char>('0' + frac % 10);
  }
  return p;
}

// JSON 2-D array "[[...],[...]]" of rows x cols float32 values.
// Returns bytes written, or -1 if cap would overflow.
int64_t b2_json_f32_matrix(const float *data, int64_t rows, int64_t cols,
                           char *out, int64_t cap) {
  char *p = out;
  char *end = out + cap - 8;  // slack for closing brackets
  *p++ = '[';
  for (int64_t i = 0; i < rows; i++) {
    if (i) *p++ = ',';
    *p++ = '[';
    const float *row = data + i * cols;
    for (int64_t j = 0; j < cols; j++) {
      if (j) *p++ = ',';
      p = fmt2(p, static_cast<double>(row[j]));
      if (p >= end) return -1;
    }
    *p++ = ']';
  }
  *p++ = ']';
  return p - out;
}

// JSON 1-D array of float64 values (axes, spectra).
int64_t b2_json_f64_vector(const double *data, int64_t n, char *out,
                           int64_t cap) {
  char *p = out;
  char *end = out + cap - 8;
  *p++ = '[';
  for (int64_t i = 0; i < n; i++) {
    if (i) *p++ = ',';
    p = fmt2(p, data[i]);
    if (p >= end) return -1;
  }
  *p++ = ']';
  return p - out;
}

// ---------------------------------------------------------------------------
// Chunked TCP JSON sender (Socket.cpp:4-5,21-32: MTU-sized chunks).
// ---------------------------------------------------------------------------

int b2_tcp_connect(const char *ip, int port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::inet_pton(AF_INET, ip, &addr.sin_addr) != 1 ||
      ::connect(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) != 0) {
    ::close(fd);
    return -1;
  }
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

// Send len bytes in chunk-sized writes. Returns 1 on success, 0 on error.
int b2_tcp_send_chunked(int fd, const char *data, int64_t len, int chunk) {
  for (int64_t off = 0; off < len;) {
    int64_t m = std::min<int64_t>(chunk, len - off);
    ssize_t sent = ::send(fd, data + off, m, MSG_NOSIGNAL);
    if (sent <= 0) return 0;
    off += sent;
  }
  return 1;
}

void b2_tcp_close(int fd) {
  if (fd >= 0) ::close(fd);
}

}  // extern "C"
