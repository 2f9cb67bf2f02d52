// MP3 decode for the native audio runtime (the pydub/ffmpeg role for the
// bundled demo .mp3 resources — SURVEY.md §2.4).
//
// Decoding engine: the system's libmpg123 (present in this image, loaded via
// dlopen with self-declared prototypes — the same "native codec dependency"
// position the reference takes with ffmpeg, but wrapped behind our C ABI and
// with a clean -3 error when the library is absent).  Frame-header parsing
// stays in-repo for validation/metadata.

#include "ovt_audio.h"

#include <dlfcn.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// --- libmpg123 API surface (stable C ABI) -----------------------------------
using mpg123_handle = void;

struct Mpg123 {
  int (*init)();
  mpg123_handle* (*make)(const char*, int*);
  int (*open)(mpg123_handle*, const char*);
  int (*getformat)(mpg123_handle*, long*, int*, int*);
  int (*format_none)(mpg123_handle*);
  int (*format)(mpg123_handle*, long, int, int);
  int (*read)(mpg123_handle*, unsigned char*, size_t, size_t*);
  int (*close)(mpg123_handle*);
  void (*del)(mpg123_handle*);
  bool ok = false;
};

constexpr int kMpg123Ok = 0;
constexpr int kMpg123Done = -12;
constexpr int kMpg123NewFormat = -11;
constexpr int kEncFloat32 = 0x200;
constexpr int kEncSigned16 = 0x0D0;

Mpg123 load_mpg123() {
  Mpg123 m{};
  void* h = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libmpg123.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return m;
  m.init = reinterpret_cast<decltype(m.init)>(dlsym(h, "mpg123_init"));
  m.make = reinterpret_cast<decltype(m.make)>(dlsym(h, "mpg123_new"));
  m.open = reinterpret_cast<decltype(m.open)>(dlsym(h, "mpg123_open"));
  m.getformat = reinterpret_cast<decltype(m.getformat)>(dlsym(h, "mpg123_getformat"));
  m.format_none = reinterpret_cast<decltype(m.format_none)>(dlsym(h, "mpg123_format_none"));
  m.format = reinterpret_cast<decltype(m.format)>(dlsym(h, "mpg123_format"));
  m.read = reinterpret_cast<decltype(m.read)>(dlsym(h, "mpg123_read"));
  m.close = reinterpret_cast<decltype(m.close)>(dlsym(h, "mpg123_close"));
  m.del = reinterpret_cast<decltype(m.del)>(dlsym(h, "mpg123_delete"));
  m.ok = m.init && m.make && m.open && m.getformat && m.format_none && m.format &&
         m.read && m.close && m.del;
  if (m.ok) m.init();
  return m;
}

Mpg123& engine() {
  static Mpg123 m = load_mpg123();
  return m;
}

}  // namespace

extern "C" int64_t ovt_mp3_decode(const char* path, float** out, int* sample_rate,
                                  int* channels) {
  Mpg123& m = engine();
  if (!m.ok) return -3;  // engine unavailable

  int err = 0;
  mpg123_handle* h = m.make(nullptr, &err);
  if (!h) return -3;

  // accept only float32 output at every MPEG rate, BEFORE open — format
  // changes after open only apply at the next format event
  static const long kRates[] = {8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000};
  constexpr int kMonoStereo = 3;  // MPG123_MONO | MPG123_STEREO
  m.format_none(h);
  bool use_float = true;
  int enc_ok = 0;
  for (long r : kRates) enc_ok |= (m.format(h, r, kMonoStereo, kEncFloat32) == kMpg123Ok);
  if (!enc_ok) {
    use_float = false;
    m.format_none(h);
    for (long r : kRates) m.format(h, r, kMonoStereo, kEncSigned16);
  }

  if (m.open(h, path) != kMpg123Ok) {
    m.del(h);
    return -1;
  }
  long rate = 0;
  int ch = 0, enc = 0;
  if (m.getformat(h, &rate, &ch, &enc) != kMpg123Ok || rate <= 0 || ch <= 0) {
    m.close(h);
    m.del(h);
    return -2;
  }

  std::vector<float> samples;
  std::vector<unsigned char> buf(1 << 16);
  for (;;) {
    size_t done = 0;
    int rc = m.read(h, buf.data(), buf.size(), &done);
    if (done > 0) {
      if (use_float) {
        size_t n = done / sizeof(float);
        const float* p = reinterpret_cast<const float*>(buf.data());
        samples.insert(samples.end(), p, p + n);
      } else {
        size_t n = done / sizeof(int16_t);
        const int16_t* p = reinterpret_cast<const int16_t*>(buf.data());
        for (size_t i = 0; i < n; i++) samples.push_back(float(p[i]) / 32768.0f);
      }
    }
    if (rc == kMpg123Done) break;
    if (rc == kMpg123NewFormat) {
      // format changed mid-stream: refresh (rare; keep decoding)
      m.getformat(h, &rate, &ch, &enc);
      continue;
    }
    if (rc != kMpg123Ok && done == 0) break;
  }
  m.close(h);
  m.del(h);

  if (samples.empty()) return -2;
  int64_t frames = int64_t(samples.size()) / ch;
  float* result = static_cast<float*>(std::malloc(frames * ch * sizeof(float)));
  if (!result) return -4;
  std::memcpy(result, samples.data(), frames * ch * sizeof(float));
  *out = result;
  *sample_rate = int(rate);
  *channels = ch;
  return frames;
}
