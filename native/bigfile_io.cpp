// Native bigfile block I/O (C++17, no dependencies).
//
// Implements the bigfile on-disk format (text `header`, text `attrs-v2`,
// raw little-endian data files "%06X") for the hot data path: bulk
// chunked reads/writes with OS-level parallelism via pread/pwrite and
// a thread pool.  The Python layer (shenqi_tpu/io/bigfile.py) handles
// metadata; this library moves the bytes.
//
// Exposed C ABI (ctypes):
//   int bf_write_block(const char* path, const char* dtype, int nmemb,
//                      long long size, int nfile, const void* data);
//   int bf_read_block(const char* path, const char* dtype, int nmemb,
//                     long long start, long long count, void* out);
//   long long bf_block_size(const char* path);
//   unsigned int bf_sysv_checksum(const void* data, long long nbytes);

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <sys/stat.h>
#include <sys/types.h>
#include <fcntl.h>
#include <unistd.h>
#include <errno.h>

namespace {

int dtype_itemsize(const char* dtype) {
    // dtype like "<f4", "<u8", "|u1"
    if (!dtype || std::strlen(dtype) < 3) return -1;
    int w = std::atoi(dtype + 2);
    return w > 0 ? w : -1;
}

unsigned int sysv_sum(const unsigned char* p, long long n,
                      unsigned int start = 0) {
    unsigned long long s = start;
    for (long long i = 0; i < n; i++) s += p[i];
    return (unsigned int)(s & 0xFFFFFFFFu);
}

std::string fname_for(const std::string& base, int fid) {
    char buf[16];
    std::snprintf(buf, sizeof buf, "%06X", fid);
    return base + "/" + buf;
}

// balanced split like the bigfile C library
long long rows_before(long long size, int nfile, int fid) {
    return (size * fid) / nfile;
}

struct WriteJob {
    std::string path;
    const unsigned char* data;
    long long nbytes;
    unsigned int checksum = 0;
    int rc = 0;
};

void run_write(WriteJob* job) {
    int fd = ::open(job->path.c_str(), O_WRONLY | O_CREAT | O_TRUNC,
                    0644);
    if (fd < 0) { job->rc = -errno; return; }
    long long off = 0;
    while (off < job->nbytes) {
        ssize_t w = ::pwrite(fd, job->data + off,
                             (size_t)(job->nbytes - off), (off_t)off);
        if (w <= 0) { job->rc = -errno; ::close(fd); return; }
        off += w;
    }
    ::close(fd);
    job->checksum = sysv_sum(job->data, job->nbytes);
}

} // namespace

extern "C" {

unsigned int bf_sysv_checksum(const void* data, long long nbytes) {
    return sysv_sum((const unsigned char*)data, nbytes);
}

// Write a complete block: creates dir, data files (parallel), header.
int bf_write_block(const char* path, const char* dtype, int nmemb,
                   long long size, int nfile, const void* data) {
    int itemsize = dtype_itemsize(dtype);
    if (itemsize <= 0 || nmemb <= 0 || nfile <= 0 || size < 0)
        return -1;
    ::mkdir(path, 0755);  // parents must exist (python handles those)
    const long long rowbytes = (long long)itemsize * nmemb;
    const unsigned char* base = (const unsigned char*)data;

    std::vector<WriteJob> jobs(nfile);
    for (int fid = 0; fid < nfile; fid++) {
        long long lo = rows_before(size, nfile, fid);
        long long hi = rows_before(size, nfile, fid + 1);
        jobs[fid].path = fname_for(path, fid);
        jobs[fid].data = base + lo * rowbytes;
        jobs[fid].nbytes = (hi - lo) * rowbytes;
    }
    unsigned nthreads = std::min<unsigned>(
        nfile, std::max(1u, std::thread::hardware_concurrency()));
    std::atomic<int> next{0};
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < nthreads; t++) {
        pool.emplace_back([&]() {
            int i;
            while ((i = next.fetch_add(1)) < nfile)
                run_write(&jobs[i]);
        });
    }
    for (auto& th : pool) th.join();
    for (auto& j : jobs) if (j.rc) return j.rc;

    // header
    std::string hpath = std::string(path) + "/header";
    FILE* fh = std::fopen(hpath.c_str(), "w");
    if (!fh) return -errno;
    std::fprintf(fh, "DTYPE: %s\n", dtype);
    std::fprintf(fh, "NMEMB: %d\n", nmemb);
    std::fprintf(fh, "NFILE: %d\n", nfile);
    for (int fid = 0; fid < nfile; fid++) {
        long long rows = rows_before(size, nfile, fid + 1)
                       - rows_before(size, nfile, fid);
        unsigned int s = jobs[fid].checksum;
        unsigned int r = (s & 0xffff) + ((s & 0xffffffff) >> 16);
        unsigned int folded = (r & 0xffff) + (r >> 16);
        std::fprintf(fh, "%06X: %lld : %u : %u\n", fid, rows, s,
                     folded);
    }
    std::fclose(fh);
    // empty attrs-v2 if absent (python may rewrite it)
    std::string apath = std::string(path) + "/attrs-v2";
    if (::access(apath.c_str(), F_OK) != 0) {
        FILE* fa = std::fopen(apath.c_str(), "w");
        if (fa) std::fclose(fa);
    }
    return 0;
}

// Parse header: returns size (rows) and fills nmemb/nfile/dtype if the
// out-pointers are non-null.
long long bf_block_info(const char* path, char* dtype_out,
                        int* nmemb_out, int* nfile_out,
                        long long* fsizes_out /* may be null, cap 4096 */) {
    std::string hpath = std::string(path) + "/header";
    FILE* fh = std::fopen(hpath.c_str(), "r");
    if (!fh) return -1;
    char dtype[16] = {0};
    int nmemb = 0, nfile = 0;
    if (std::fscanf(fh, " DTYPE: %15s", dtype) != 1 ||
        std::fscanf(fh, " NMEMB: %d", &nmemb) != 1 ||
        std::fscanf(fh, " NFILE: %d", &nfile) != 1 ||
        nfile < 0 || nfile > 4096) {
        std::fclose(fh);
        return -1;
    }
    long long total = 0;
    for (int i = 0; i < nfile; i++) {
        long long fid, rows;
        unsigned int c1, c2;
        if (std::fscanf(fh, " %llX: %lld : %u : %u", &fid, &rows, &c1,
                        &c2) != 4) break;
        if (fsizes_out && fid < 4096) fsizes_out[fid] = rows;
        total += rows;
    }
    std::fclose(fh);
    if (dtype_out) std::strncpy(dtype_out, dtype, 15);
    if (nmemb_out) *nmemb_out = nmemb;
    if (nfile_out) *nfile_out = nfile;
    return total;
}

long long bf_block_size(const char* path) {
    return bf_block_info(path, nullptr, nullptr, nullptr, nullptr);
}

// Read rows [start, start+count) into out (must be preallocated).
int bf_read_block(const char* path, const char* dtype, int nmemb,
                  long long start, long long count, void* out) {
    char ftype[16] = {0};
    int fnmemb = 0, nfile = 0;
    std::vector<long long> fsizes(4096, 0);
    long long total = bf_block_info(path, ftype, &fnmemb, &nfile,
                                    fsizes.data());
    if (total < 0) return -1;
    if (std::strcmp(ftype, dtype) != 0 || fnmemb != nmemb) return -2;
    int itemsize = dtype_itemsize(dtype);
    if (itemsize <= 0) return -3;
    const long long rowbytes = (long long)itemsize * nmemb;
    unsigned char* dst = (unsigned char*)out;

    long long lo = 0;
    for (int fid = 0; fid < nfile; fid++) {
        long long hi = lo + fsizes[fid];
        long long s = std::max(start, lo);
        long long e = std::min(start + count, hi);
        if (s < e) {
            int fd = ::open(fname_for(path, fid).c_str(), O_RDONLY);
            if (fd < 0) return -errno;
            long long nbytes = (e - s) * rowbytes;
            long long off = 0;
            unsigned char* p = dst + (s - start) * rowbytes;
            while (off < nbytes) {
                ssize_t r = ::pread(fd, p + off,
                                    (size_t)(nbytes - off),
                                    (off_t)((s - lo) * rowbytes + off));
                if (r <= 0) { ::close(fd); return -errno; }
                off += r;
            }
            ::close(fd);
        }
        lo = hi;
    }
    return 0;
}

} // extern "C"
