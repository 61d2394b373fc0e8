// Native tar shard reader for the x2i_tpu data engine.
//
// Role: the reference's data plane leans on torch DataLoader workers and a
// Ray/rpyc fetch tier (/root/reference/core/data/dataloader.py). Our
// Python pipeline (x2i_tpu/data/webdataset.py) is correct but pays the
// interpreter for tar header walks and copies; this library does the
// header scan and bulk member reads in C++ with pread (no GIL held during
// IO via ctypes), exposed as:
//
//   int64 tar_index(path, entries_out, max_entries)
//     -> number of regular-file members; fills {name[256], offset, size}.
//   int64 tar_read(path, offset, size, buf)
//     -> bytes read (pread into caller buffer).
//
// Supports ustar + GNU tar headers with octal and base-256 sizes; long
// names via GNU 'L' entries. Sparse/pax-extended entries fall back to the
// Python reader (index returns -2 so the caller can downgrade).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <unistd.h>

extern "C" {

struct TarEntry {
  char name[256];
  int64_t offset;   // payload offset in the file
  int64_t size;     // payload size in bytes
};

static int64_t parse_size(const unsigned char* p, int n) {
  if (p[0] & 0x80) {  // base-256
    int64_t v = p[0] & 0x7f;
    for (int i = 1; i < n; ++i) v = (v << 8) | p[i];
    return v;
  }
  int64_t v = 0;
  for (int i = 0; i < n; ++i) {
    unsigned char c = p[i];
    if (c == ' ' || c == '\0') continue;
    if (c < '0' || c > '7') return -1;
    v = (v << 3) | (c - '0');
  }
  return v;
}

int64_t tar_index(const char* path, TarEntry* entries, int64_t max_entries) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  unsigned char hdr[512];
  int64_t pos = 0;
  int64_t count = 0;
  char longname[256] = {0};
  bool have_longname = false;

  while (true) {
    ssize_t r = pread(fd, hdr, 512, pos);
    if (r < 512) break;
    // end-of-archive: zero block
    bool all_zero = true;
    for (int i = 0; i < 512; ++i) {
      if (hdr[i]) { all_zero = false; break; }
    }
    if (all_zero) break;

    int64_t size = parse_size(hdr + 124, 12);
    if (size < 0) { close(fd); return -2; }
    char type = (char)hdr[156];
    int64_t payload = pos + 512;
    int64_t padded = (size + 511) & ~511LL;

    if (type == 'L') {  // GNU long name: payload is the next entry's name
      int64_t n = size < 255 ? size : 255;
      if (pread(fd, longname, n, payload) != n) { close(fd); return -2; }
      longname[n] = '\0';
      have_longname = true;
    } else if (type == 'x' || type == 'g') {
      // pax extended headers: unsupported here -> python fallback
      close(fd);
      return -2;
    } else if (type == '0' || type == '\0') {
      if (count < max_entries) {
        TarEntry* e = &entries[count];
        if (have_longname) {
          snprintf(e->name, sizeof(e->name), "%s", longname);
        } else {
          char prefix[156] = {0};
          memcpy(prefix, hdr + 345, 155);
          char name[101] = {0};
          memcpy(name, hdr, 100);
          if (prefix[0]) {
            snprintf(e->name, sizeof(e->name), "%s/%s", prefix, name);
          } else {
            snprintf(e->name, sizeof(e->name), "%s", name);
          }
        }
        e->offset = payload;
        e->size = size;
      }
      count++;
      have_longname = false;
    } else {
      have_longname = false;  // dirs, links, etc: skip
    }
    pos = payload + padded;
  }
  close(fd);
  return count;
}

int64_t tar_read(const char* path, int64_t offset, int64_t size, char* buf) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t done = 0;
  while (done < size) {
    ssize_t r = pread(fd, buf + done, size - done, offset + done);
    if (r <= 0) break;
    done += r;
  }
  close(fd);
  return done;
}

}  // extern "C"
