// Native TensorBoard event writer.
//
// C++ implementation of the TFRecord event-file format (masked CRC32C framing
// + hand-encoded Event/Summary protobuf), the native-tier equivalent of the
// reference's vendored tensorboard_logger
// (libs/tensorboard_logger/include/tensorboard_logger.h:88-161). Exposed as a
// small C API consumed from Python via ctypes (ppo_tpu/utils/native.py); the
// Python SummaryWriter transparently uses it when the shared library is built.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

namespace {

// ---- crc32c (Castagnoli) --------------------------------------------------
uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c >> 1) ^ (0x82F63B78u & (~(c & 1) + 1));
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  if (!crc_init_done) crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) crc = (crc >> 8) ^ crc_table[(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---- protobuf wire encoding ----------------------------------------------
void put_varint(std::string& out, uint64_t v) {
  while (true) {
    uint8_t b = v & 0x7F;
    v >>= 7;
    if (v) {
      out.push_back(static_cast<char>(b | 0x80));
    } else {
      out.push_back(static_cast<char>(b));
      return;
    }
  }
}

void put_key(std::string& out, int field, int wire) { put_varint(out, (field << 3) | wire); }

void put_len_delim(std::string& out, int field, const std::string& payload) {
  put_key(out, field, 2);
  put_varint(out, payload.size());
  out += payload;
}

void put_double(std::string& out, int field, double v) {
  put_key(out, field, 1);
  out.append(reinterpret_cast<const char*>(&v), 8);
}

void put_float(std::string& out, int field, float v) {
  put_key(out, field, 5);
  out.append(reinterpret_cast<const char*>(&v), 4);
}

void put_int64(std::string& out, int field, int64_t v) {
  put_key(out, field, 0);
  put_varint(out, static_cast<uint64_t>(v));
}

double now_s() {
  struct timespec ts;
  clock_gettime(CLOCK_REALTIME, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

struct Writer {
  FILE* f;
};

void write_record(Writer* w, const std::string& event) {
  uint64_t len = event.size();
  uint8_t header[8];
  std::memcpy(header, &len, 8);
  uint32_t hcrc = masked_crc(header, 8);
  uint32_t dcrc = masked_crc(reinterpret_cast<const uint8_t*>(event.data()), event.size());
  std::fwrite(header, 1, 8, w->f);
  std::fwrite(&hcrc, 4, 1, w->f);
  std::fwrite(event.data(), 1, event.size(), w->f);
  std::fwrite(&dcrc, 4, 1, w->f);
  std::fflush(w->f);
}

}  // namespace

extern "C" {

void* tb_open(const char* path) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return nullptr;
  Writer* w = new Writer{f};
  // file_version event ("brain.Event:2")
  std::string ev;
  put_double(ev, 1, now_s());
  put_len_delim(ev, 3, "brain.Event:2");
  write_record(w, ev);
  return w;
}

void tb_scalar(void* handle, const char* tag, float value, int64_t step) {
  Writer* w = static_cast<Writer*>(handle);
  std::string val;
  put_len_delim(val, 1, tag);
  put_float(val, 2, value);
  std::string summary;
  put_len_delim(summary, 1, val);
  std::string ev;
  put_double(ev, 1, now_s());
  put_int64(ev, 2, step);
  put_len_delim(ev, 5, summary);
  write_record(w, ev);
}

void tb_text(void* handle, const char* tag, const char* text, int64_t step) {
  Writer* w = static_cast<Writer*>(handle);
  std::string plugin;
  put_len_delim(plugin, 1, "text");
  std::string metadata;
  put_len_delim(metadata, 1, plugin);
  std::string dim;
  put_int64(dim, 1, 1);
  std::string shape;
  put_len_delim(shape, 2, dim);
  std::string tensor;
  put_int64(tensor, 1, 7);  // DT_STRING
  put_len_delim(tensor, 2, shape);
  put_len_delim(tensor, 8, text);
  std::string val;
  put_len_delim(val, 1, tag);
  put_len_delim(val, 9, metadata);
  put_len_delim(val, 8, tensor);
  std::string summary;
  put_len_delim(summary, 1, val);
  std::string ev;
  put_double(ev, 1, now_s());
  put_int64(ev, 2, step);
  put_len_delim(ev, 5, summary);
  write_record(w, ev);
}

void tb_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  std::fclose(w->f);
  delete w;
}

}  // extern "C"
