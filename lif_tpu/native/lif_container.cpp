// Native LIF container codec.
//
// The hot path of a production loader is scanning the binary field table of
// many LIF files (magic 0x1E1A at EOF-2, u32be region offset at EOF-6, then
// a (type, size, payload) record table — reference format semantics per
// src/LifLoader.ts:380-406). This library does the scan/validation in C++
// and hands Python (ctypes) a flat table of field descriptors; payloads are
// never copied — Python slices the original buffer by offset.
//
// Build: see lif_tpu/native/build.py (g++ -O2 -shared -fPIC).
//
// C ABI:
//   int lif_parse(const uint8_t* data, uint64_t size,
//                 LifField* out_fields, uint32_t max_fields,
//                 uint32_t* out_count);
//     returns 0 on success, negative error codes otherwise.
//   int lif_validate(const uint8_t* data, uint64_t size);
//   uint64_t lif_write_size(uint64_t jpeg_size, const uint64_t* field_sizes,
//                           uint32_t n_fields);
//   int lif_write(const uint8_t* jpeg, uint64_t jpeg_size,
//                 const uint32_t* types, const uint8_t** payloads,
//                 const uint64_t* sizes, uint32_t n_fields,
//                 uint8_t* out, uint64_t out_capacity, uint64_t* out_size);

#include <cstdint>
#include <cstring>

namespace {

constexpr uint16_t kMagic = 0x1E1A;

inline uint16_t read_u16be(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}

inline uint32_t read_u32be(const uint8_t* p) {
  return (static_cast<uint32_t>(p[0]) << 24) |
         (static_cast<uint32_t>(p[1]) << 16) |
         (static_cast<uint32_t>(p[2]) << 8) | static_cast<uint32_t>(p[3]);
}

inline void write_u16be(uint8_t* p, uint16_t v) {
  p[0] = static_cast<uint8_t>(v >> 8);
  p[1] = static_cast<uint8_t>(v);
}

inline void write_u32be(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v >> 24);
  p[1] = static_cast<uint8_t>(v >> 16);
  p[2] = static_cast<uint8_t>(v >> 8);
  p[3] = static_cast<uint8_t>(v);
}

}  // namespace

extern "C" {

struct LifField {
  uint32_t field_type;
  uint32_t reserved;
  uint64_t offset;  // payload offset into the original buffer
  uint64_t size;    // payload size in bytes
};

enum LifError {
  LIF_OK = 0,
  LIF_ERR_TOO_SHORT = -1,
  LIF_ERR_BAD_MAGIC = -2,
  LIF_ERR_BAD_REGION = -3,
  LIF_ERR_TRUNCATED = -4,
  LIF_ERR_TOO_MANY_FIELDS = -5,
  LIF_ERR_CAPACITY = -6,
  LIF_ERR_FIELD_TOO_LARGE = -7,  // u32 field-table limits exceeded
};

int lif_parse(const uint8_t* data, uint64_t size, LifField* out_fields,
              uint32_t max_fields, uint32_t* out_count) {
  if (out_count) *out_count = 0;
  if (size < 8) return LIF_ERR_TOO_SHORT;
  if (read_u16be(data + size - 2) != kMagic) return LIF_ERR_BAD_MAGIC;

  const uint64_t region_offset = read_u32be(data + size - 6);
  if (region_offset > size || region_offset < 6) return LIF_ERR_BAD_REGION;
  uint64_t pos = size - region_offset;
  if (pos + 4 > size) return LIF_ERR_BAD_REGION;

  const uint32_t count = read_u32be(data + pos);
  pos += 4;
  if (out_fields && count > max_fields) return LIF_ERR_TOO_MANY_FIELDS;

  for (uint32_t i = 0; i < count; ++i) {
    if (pos + 8 > size) return LIF_ERR_TRUNCATED;
    const uint32_t ftype = read_u32be(data + pos);
    const uint32_t fsize = read_u32be(data + pos + 4);
    pos += 8;
    if (pos + fsize > size) return LIF_ERR_TRUNCATED;
    if (out_fields) {
      out_fields[i].field_type = ftype;
      out_fields[i].reserved = 0;
      out_fields[i].offset = pos;
      out_fields[i].size = fsize;
    }
    pos += fsize;
  }
  if (out_count) *out_count = count;
  return LIF_OK;
}

int lif_validate(const uint8_t* data, uint64_t size) {
  return lif_parse(data, size, nullptr, 0, nullptr);
}

uint64_t lif_write_size(uint64_t jpeg_size, const uint64_t* field_sizes,
                        uint32_t n_fields) {
  uint64_t total = jpeg_size + 4;  // field count
  for (uint32_t i = 0; i < n_fields; ++i) total += 8 + field_sizes[i];
  return total + 6;  // region offset + magic
}

int lif_write(const uint8_t* jpeg, uint64_t jpeg_size, const uint32_t* types,
              const uint8_t** payloads, const uint64_t* sizes,
              uint32_t n_fields, uint8_t* out, uint64_t out_capacity,
              uint64_t* out_size) {
  // the on-disk field table stores sizes and the region offset as u32be:
  // refuse payloads or regions that would silently truncate
  uint64_t region_bytes = 4 + 6;  // field count + trailer
  for (uint32_t i = 0; i < n_fields; ++i) {
    if (sizes[i] > UINT32_MAX) return LIF_ERR_FIELD_TOO_LARGE;
    region_bytes += 8 + sizes[i];
    if (region_bytes > UINT32_MAX) return LIF_ERR_FIELD_TOO_LARGE;
  }
  const uint64_t need = lif_write_size(jpeg_size, sizes, n_fields);
  if (out_size) *out_size = need;
  if (need > out_capacity) return LIF_ERR_CAPACITY;

  uint64_t pos = 0;
  std::memcpy(out, jpeg, jpeg_size);
  pos += jpeg_size;

  const uint64_t region_start = pos;
  write_u32be(out + pos, n_fields);
  pos += 4;
  for (uint32_t i = 0; i < n_fields; ++i) {
    write_u32be(out + pos, types[i]);
    write_u32be(out + pos + 4, static_cast<uint32_t>(sizes[i]));
    pos += 8;
    std::memcpy(out + pos, payloads[i], sizes[i]);
    pos += sizes[i];
  }
  // region_offset counts from region start to EOF (region + 6-byte trailer)
  const uint64_t region_offset = (pos - region_start) + 6;
  write_u32be(out + pos, static_cast<uint32_t>(region_offset));
  write_u16be(out + pos + 4, kMagic);
  pos += 6;
  if (out_size) *out_size = pos;
  return LIF_OK;
}

}  // extern "C"
