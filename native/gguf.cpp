// GGUF v3 mmap loader: header parse, tensor directory, zero-copy data
// pointers. The data-loader role of the reference's ggml/src/gguf.cpp +
// src/llama-mmap.cpp: metadata (KV) stays with the Python reader, which is
// cold-path; this native loader serves the multi-GB tensor blobs.

#include "omni_native.h"
#include "common.hpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdio>
#include <string>
#include <vector>

namespace {

struct TensorInfo {
    std::string name;
    int32_t ggml_type;
    int n_dims;
    int64_t shape[4];  // logical (row-major numpy order)
    uint64_t offset;   // relative to data section
    int64_t nbytes;
};

struct Traits { int block_size; int type_size; };

Traits traits(int t) {
    switch (t) {
        case 0:  return {1, 4};
        case 1:  return {1, 2};
        case 2:  return {32, 18};
        case 3:  return {32, 20};
        case 6:  return {32, 22};
        case 7:  return {32, 24};
        case 8:  return {32, 34};
        case 9:  return {32, 36};
        case 10: return {256, 84};
        case 11: return {256, 110};
        case 12: return {256, 144};
        case 13: return {256, 176};
        case 14: return {256, 210};
        case 15: return {256, 292};
        case 24: return {1, 1};
        case 25: return {1, 2};
        case 26: return {1, 4};
        case 27: return {1, 8};
        case 28: return {1, 8};
        case 30: return {1, 2};
        default: return {0, 0};
    }
}

struct Reader {
    const uint8_t *p;
    size_t size;
    size_t pos = 0;
    bool ok = true;

    template <typename T> T get() {
        if (pos + sizeof(T) > size) { ok = false; return T{}; }
        T v;
        std::memcpy(&v, p + pos, sizeof(T));
        pos += sizeof(T);
        return v;
    }
    std::string str() {
        uint64_t len = get<uint64_t>();
        if (!ok || pos + len > size) { ok = false; return {}; }
        std::string s((const char *)(p + pos), len);
        pos += len;
        return s;
    }
    void skip(size_t n) {
        if (pos + n > size) ok = false;
        else pos += n;
    }
};

size_t scalar_size(uint32_t vt) {
    switch (vt) {
        case 0: case 1: case 7: return 1;          // u8, i8, bool
        case 2: case 3: return 2;                  // u16, i16
        case 4: case 5: case 6: return 4;          // u32, i32, f32
        case 10: case 11: case 12: return 8;       // u64, i64, f64
        default: return 0;
    }
}

}  // namespace

struct on_gguf {
    int fd = -1;
    const uint8_t *map = nullptr;
    size_t file_size = 0;
    uint32_t version = 0;
    uint64_t alignment = 32;
    size_t data_offset = 0;
    std::vector<TensorInfo> tensors;
};

extern "C" {

on_gguf *on_gguf_open(const char *path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 24) { ::close(fd); return nullptr; }
    void *map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
    if (map == MAP_FAILED) { ::close(fd); return nullptr; }

    auto *g = new on_gguf;
    g->fd = fd;
    g->map = (const uint8_t *)map;
    g->file_size = (size_t)st.st_size;

    Reader r{g->map, g->file_size};
    uint32_t magic = r.get<uint32_t>();
    g->version = r.get<uint32_t>();
    uint64_t n_tensors = r.get<uint64_t>();
    uint64_t n_kv = r.get<uint64_t>();
    if (!r.ok || magic != 0x46554747u /* "GGUF" */ || g->version < 2) {
        on_gguf_close(g);
        return nullptr;
    }

    // skip KV values, but capture general.alignment
    for (uint64_t i = 0; i < n_kv && r.ok; ++i) {
        std::string key = r.str();
        uint32_t vt = r.get<uint32_t>();
        if (vt == 8) {  // string
            uint64_t len = r.get<uint64_t>();
            r.skip(len);
        } else if (vt == 9) {  // array
            uint32_t et = r.get<uint32_t>();
            uint64_t cnt = r.get<uint64_t>();
            if (et == 8) {
                for (uint64_t j = 0; j < cnt && r.ok; ++j) {
                    uint64_t len = r.get<uint64_t>();
                    r.skip(len);
                }
            } else {
                size_t es = scalar_size(et);
                if (!es) { r.ok = false; break; }
                r.skip(es * cnt);
            }
        } else {
            size_t es = scalar_size(vt);
            if (!es) { r.ok = false; break; }
            if (key == "general.alignment" && (vt == 4 || vt == 10)) {
                uint64_t a = (vt == 4) ? (uint64_t)r.get<uint32_t>()
                                       : r.get<uint64_t>();
                if (a) g->alignment = a;
            } else {
                r.skip(es);
            }
        }
    }

    g->tensors.reserve(n_tensors);
    for (uint64_t i = 0; i < n_tensors && r.ok; ++i) {
        TensorInfo ti;
        ti.name = r.str();
        uint32_t nd = r.get<uint32_t>();
        if (nd > 4) { r.ok = false; break; }
        ti.n_dims = (int)nd;
        int64_t ne[4] = {1, 1, 1, 1};
        for (uint32_t dd = 0; dd < nd; ++dd) ne[dd] = (int64_t)r.get<uint64_t>();
        // GGUF ne order is fastest-first; logical numpy shape reverses it
        for (int dd = 0; dd < 4; ++dd) ti.shape[dd] = 1;
        for (uint32_t dd = 0; dd < nd; ++dd) ti.shape[dd] = ne[nd - 1 - dd];
        ti.ggml_type = (int32_t)r.get<uint32_t>();
        ti.offset = r.get<uint64_t>();
        Traits tr = traits(ti.ggml_type);
        if (tr.block_size == 0) { r.ok = false; break; }
        int64_t n_elem = 1;
        for (int dd = 0; dd < 4; ++dd) n_elem *= ti.shape[dd];
        if (n_elem % tr.block_size) { r.ok = false; break; }
        ti.nbytes = n_elem / tr.block_size * tr.type_size;
        g->tensors.push_back(std::move(ti));
    }
    if (!r.ok) {
        on_gguf_close(g);
        return nullptr;
    }
    g->data_offset = (r.pos + g->alignment - 1) / g->alignment * g->alignment;
    for (const auto &ti : g->tensors) {
        if (g->data_offset + ti.offset + (uint64_t)ti.nbytes > g->file_size) {
            on_gguf_close(g);
            return nullptr;
        }
    }
    return g;
}

void on_gguf_close(on_gguf *g) {
    if (!g) return;
    if (g->map) munmap((void *)g->map, g->file_size);
    if (g->fd >= 0) ::close(g->fd);
    delete g;
}

int64_t on_gguf_n_tensors(const on_gguf *g) { return (int64_t)g->tensors.size(); }
uint32_t on_gguf_version(const on_gguf *g) { return g->version; }
int64_t on_gguf_data_offset(const on_gguf *g) { return (int64_t)g->data_offset; }

const char *on_gguf_tensor_name(const on_gguf *g, int64_t i) {
    return g->tensors[(size_t)i].name.c_str();
}
int on_gguf_tensor_type(const on_gguf *g, int64_t i) {
    return g->tensors[(size_t)i].ggml_type;
}
int on_gguf_tensor_ndims(const on_gguf *g, int64_t i) {
    return g->tensors[(size_t)i].n_dims;
}
void on_gguf_tensor_shape(const on_gguf *g, int64_t i, int64_t out[4]) {
    for (int d = 0; d < 4; ++d) out[d] = g->tensors[(size_t)i].shape[d];
}
int64_t on_gguf_tensor_nbytes(const on_gguf *g, int64_t i) {
    return g->tensors[(size_t)i].nbytes;
}
const uint8_t *on_gguf_tensor_data(const on_gguf *g, int64_t i) {
    return g->map + g->data_offset + g->tensors[(size_t)i].offset;
}

}  // extern "C"
