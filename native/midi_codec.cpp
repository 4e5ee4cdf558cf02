// Native MIDI encoder — the host-side hot path of the serving/sampling
// pipeline. Produces Standard MIDI File bytes byte-identical to the Python
// writer (melogan_tpu/midi/midifile.py): format 1, division 220, timing track
// (set_tempo + 4/4 time signature), one instrument track with running-status
// note_on events (velocity-0 note-offs), events ordered by
// (tick, pitch<<8|velocity), end-of-track at last tick + 1.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build:  g++ -O3 -shared -fPIC -o libmelomidi.so midi_codec.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Event {
  int64_t tick;
  uint32_t subkey;  // (10<<16) | (pitch<<8) | velocity  — note-event ordering
  uint8_t pitch;
  uint8_t velocity;  // 0 for note-off
};

inline void put_varlen(std::vector<uint8_t>& out, int64_t value) {
  uint8_t buf[10];
  int n = 0;
  buf[n++] = static_cast<uint8_t>(value & 0x7F);
  value >>= 7;
  while (value) {
    buf[n++] = static_cast<uint8_t>(0x80 | (value & 0x7F));
    value >>= 7;
  }
  for (int i = n - 1; i >= 0; --i) out.push_back(buf[i]);
}

inline void put_u32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(static_cast<uint8_t>(v >> 24));
  out.push_back(static_cast<uint8_t>(v >> 16));
  out.push_back(static_cast<uint8_t>(v >> 8));
  out.push_back(static_cast<uint8_t>(v));
}

}  // namespace

extern "C" {

// Encode a single-instrument song. Returns the number of bytes written, or
// -needed_capacity if `out_capacity` is too small, and -1 on bad input.
int64_t melomidi_write(const int32_t* pitch, const int32_t* velocity,
                       const int64_t* start_tick, const int64_t* end_tick,
                       int64_t n_notes, int32_t program, int32_t channel,
                       int32_t tempo_us, int32_t division, uint8_t* out,
                       int64_t out_capacity) {
  if (n_notes < 0 || !out) return -1;

  // --- build + sort note events -------------------------------------------
  std::vector<Event> events;
  events.reserve(2 * n_notes);
  for (int64_t i = 0; i < n_notes; ++i) {
    uint8_t p = static_cast<uint8_t>(pitch[i] & 0x7F);
    uint8_t v = static_cast<uint8_t>(velocity[i] & 0x7F);
    events.push_back({start_tick[i], (10u << 16) | (uint32_t(p) << 8) | v, p, v});
    events.push_back({end_tick[i], (10u << 16) | (uint32_t(p) << 8), p, 0});
  }
  std::stable_sort(events.begin(), events.end(),
                   [](const Event& a, const Event& b) {
                     if (a.tick != b.tick) return a.tick < b.tick;
                     return a.subkey < b.subkey;
                   });

  // --- timing track --------------------------------------------------------
  std::vector<uint8_t> t0;
  t0.reserve(32);
  t0.push_back(0x00);
  t0.push_back(0xFF); t0.push_back(0x51); t0.push_back(0x03);
  t0.push_back(static_cast<uint8_t>(tempo_us >> 16));
  t0.push_back(static_cast<uint8_t>(tempo_us >> 8));
  t0.push_back(static_cast<uint8_t>(tempo_us));
  const uint8_t ts[] = {0x00, 0xFF, 0x58, 0x04, 0x04, 0x02, 0x18, 0x08};
  t0.insert(t0.end(), ts, ts + sizeof(ts));
  t0.push_back(0x01); t0.push_back(0xFF); t0.push_back(0x2F); t0.push_back(0x00);

  // --- instrument track ----------------------------------------------------
  std::vector<uint8_t> t1;
  t1.reserve(8 + events.size() * 4);
  uint8_t ch = static_cast<uint8_t>(channel & 0x0F);
  t1.push_back(0x00);
  t1.push_back(static_cast<uint8_t>(0xC0 | ch));
  t1.push_back(static_cast<uint8_t>(program & 0x7F));

  int64_t last_tick = 0;
  int running = -1;
  const int note_status = 0x90 | ch;
  for (const Event& e : events) {
    put_varlen(t1, e.tick - last_tick);
    last_tick = e.tick;
    if (running != note_status) {
      t1.push_back(static_cast<uint8_t>(note_status));
      running = note_status;
    }
    t1.push_back(e.pitch);
    t1.push_back(e.velocity);
  }
  // end of track at last tick + 1
  t1.push_back(0x01); t1.push_back(0xFF); t1.push_back(0x2F); t1.push_back(0x00);

  // --- assemble file -------------------------------------------------------
  int64_t total = 14 + 8 + static_cast<int64_t>(t0.size()) + 8 +
                  static_cast<int64_t>(t1.size());
  if (total > out_capacity) return -total;

  std::vector<uint8_t> file;
  file.reserve(total);
  const uint8_t mthd[] = {'M', 'T', 'h', 'd', 0, 0, 0, 6, 0, 1, 0, 2};
  file.insert(file.end(), mthd, mthd + sizeof(mthd));
  file.push_back(static_cast<uint8_t>(division >> 8));
  file.push_back(static_cast<uint8_t>(division));
  const uint8_t mtrk[] = {'M', 'T', 'r', 'k'};
  file.insert(file.end(), mtrk, mtrk + 4);
  put_u32(file, static_cast<uint32_t>(t0.size()));
  file.insert(file.end(), t0.begin(), t0.end());
  file.insert(file.end(), mtrk, mtrk + 4);
  put_u32(file, static_cast<uint32_t>(t1.size()));
  file.insert(file.end(), t1.begin(), t1.end());

  std::memcpy(out, file.data(), file.size());
  return static_cast<int64_t>(file.size());
}

}  // extern "C"
