/* Native fast path for the TFRecord data loader.
 *
 * The reference relies on TensorFlow's C++ record readers; this framework's
 * runtime is TF-free, so the two byte-level hot loops live here:
 *   - crc32c (Castagnoli, slicing-by-8): record integrity checks at
 *     write/verify time (~GB/s vs ~5 MB/s for the table-driven Python).
 *   - scan_offsets: builds the random-access record index of a shard by
 *     hopping length headers (one pass, no Python per record).
 *
 * Exposed via ctypes (see data/records.py); pure-Python fallbacks keep the
 * package working if the shared object was never built.
 *
 * Build: tools/build_native.sh (cc -O3 -shared -fPIC).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static uint32_t crc_table[8][256];
static int table_ready = 0;

static void init_tables(void) {
  if (table_ready) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc_table[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = crc_table[0][i];
    for (int k = 1; k < 8; k++) {
      crc = crc_table[0][crc & 0xFF] ^ (crc >> 8);
      crc_table[k][i] = crc;
    }
  }
  table_ready = 1;
}

uint32_t crc32c(const uint8_t* data, uint64_t len) {
  init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  /* Slicing-by-8 over the aligned body. */
  while (len >= 8) {
    uint32_t lo, hi;
    memcpy(&lo, data, 4);
    memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
          crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][lo >> 24] ^
          crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
          crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
    data += 8;
    len -= 8;
  }
  while (len--) crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc32c(const uint8_t* data, uint64_t len) {
  uint32_t crc = crc32c(data, len);
  return (uint32_t)((((crc >> 15) | (crc << 17)) + 0xA282EAD8u));
}

/* Scans a TFRecord file, writing record start offsets into `offsets`
 * (capacity `max_records`).  Returns the record count, or -1 on IO error,
 * or -2 if capacity was exceeded. */
int64_t scan_offsets(const char* path, int64_t* offsets,
                     int64_t max_records) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  int64_t size = ftell(f);
  int64_t pos = 0;
  int64_t n = 0;
  uint8_t header[8];
  while (pos < size) {
    if (n >= max_records) { fclose(f); return -2; }
    if (fseek(f, pos, SEEK_SET) != 0) { fclose(f); return -1; }
    if (fread(header, 1, 8, f) != 8) break;
    uint64_t length;
    memcpy(&length, header, 8);
    int64_t end = pos + 8 + 4 + (int64_t)length + 4;
    /* Truncated final record: exclude it (the offset must only be indexed
     * when the complete frame fits within the file). */
    if (end > size) break;
    offsets[n++] = pos;
    pos = end;
  }
  fclose(f);
  return n;
}
