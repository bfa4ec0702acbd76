// Native TSV table reader.
//
// Capability parity: the reference streams ODPS tables through the native
// `common_io` reader (reference easynlp/appzoo/dataset.py:69-134, worker-
// sliced ranges); local files go through Python readlines. This reader mmaps
// a TSV, indexes row offsets once, and serves worker-sliced row ranges
// zero-copy through a C ABI (ctypes wrapper: easynlp_tpu/data/native_reader.py)
// — the host-side input pipeline must outrun the TPU (SURVEY.md §7.3).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libtsv_reader.so tsv_reader.cpp

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Reader {
    int fd = -1;
    const char* data = nullptr;
    size_t size = 0;
    std::vector<size_t> offsets;  // start of each row; +1 sentinel at end
};

}  // namespace

extern "C" {

void* tsv_open(const char* path) {
    auto* r = new Reader();
    r->fd = ::open(path, O_RDONLY);
    if (r->fd < 0) {
        delete r;
        return nullptr;
    }
    struct stat st;
    fstat(r->fd, &st);
    r->size = static_cast<size_t>(st.st_size);
    if (r->size > 0) {
        r->data = static_cast<const char*>(
            mmap(nullptr, r->size, PROT_READ, MAP_PRIVATE, r->fd, 0));
        if (r->data == MAP_FAILED) {
            ::close(r->fd);
            delete r;
            return nullptr;
        }
        madvise(const_cast<char*>(r->data), r->size, MADV_SEQUENTIAL);
        r->offsets.push_back(0);
        for (size_t i = 0; i < r->size; ++i) {
            if (r->data[i] == '\n' && i + 1 < r->size) {
                r->offsets.push_back(i + 1);
            }
        }
        r->offsets.push_back(r->size);
    } else {
        r->offsets.push_back(0);
    }
    return r;
}

int64_t tsv_num_rows(void* handle) {
    auto* r = static_cast<Reader*>(handle);
    return static_cast<int64_t>(r->offsets.size()) - 1;
}

// Copy row `idx` (without trailing newline) into buf; returns length or -1.
int64_t tsv_row(void* handle, int64_t idx, char* buf, int64_t max_len) {
    auto* r = static_cast<Reader*>(handle);
    int64_t n = tsv_num_rows(handle);
    if (idx < 0 || idx >= n) return -1;
    size_t start = r->offsets[idx];
    size_t end = r->offsets[idx + 1];
    while (end > start && (r->data[end - 1] == '\n' || r->data[end - 1] == '\r'))
        --end;
    int64_t len = static_cast<int64_t>(end - start);
    if (len > max_len) len = max_len;
    std::memcpy(buf, r->data + start, len);
    return len;
}

// Write the indices of rows containing a non-whitespace byte into out
// (up to cap); returns the total count of non-blank rows. Mirrors the
// Python loader's `if line.strip()` filter so a lazy index view can skip
// blank lines without materialising any row.
int64_t tsv_nonblank(void* handle, int64_t* out, int64_t cap) {
    auto* r = static_cast<Reader*>(handle);
    int64_t n = tsv_num_rows(handle);
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; ++i) {
        size_t start = r->offsets[i];
        size_t end = r->offsets[i + 1];
        bool nonblank = false;
        for (size_t p = start; p < end; ++p) {
            char c = r->data[p];
            if (c != ' ' && c != '\t' && c != '\r' && c != '\n'
                && c != '\v' && c != '\f') {
                nonblank = true;
                break;
            }
        }
        if (nonblank) {
            if (cnt < cap) out[cnt] = i;
            ++cnt;
        }
    }
    return cnt;
}

void tsv_close(void* handle) {
    auto* r = static_cast<Reader*>(handle);
    if (r->data && r->size) {
        munmap(const_cast<char*>(r->data), r->size);
    }
    if (r->fd >= 0) ::close(r->fd);
    delete r;
}

}  // extern "C"
