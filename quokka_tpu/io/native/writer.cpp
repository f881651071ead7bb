// Native async array writer for plotfiles/checkpoints.
//
// The TPU-native analog of the reference's AMReX VisMF parallel writer
// (reference uses amrex::VisMF / WriteMultiLevelPlotfile from its C++
// runtime; here the compute path is JAX but the I/O runtime is native so
// checkpoint writes overlap device compute instead of stalling the host
// dispatch loop).
//
// Design: a fixed pool of writer threads drains a job queue. Each job owns
// a copy of the array bytes (the Python caller hands off a host buffer and
// returns immediately; the copy is the price of async safety with numpy
// buffer lifetimes). Files are raw little-endian arrays with a 64-byte
// header carrying dtype/shape so they are self-describing; a trailing
// CRC-less length field lets readers validate truncation.
//
// C ABI (ctypes):
//   qk_writer_init(n_threads)        -> 0 on success
//   qk_write_async(path, data, nbytes, dtype_code, ndim, shape[8]) -> job id
//   qk_writer_drain()                -> blocks until all queued jobs done
//   qk_writer_errors()               -> number of failed jobs since init
//   qk_writer_shutdown()

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
    std::string path;
    std::vector<uint8_t> bytes;
    uint64_t header[8];  // magic, dtype, ndim, shape[0..4]
};

struct WriterPool {
    std::vector<std::thread> threads;
    std::deque<Job> queue;
    std::mutex mu;
    std::condition_variable cv;
    std::condition_variable cv_done;
    std::atomic<int> errors{0};
    std::atomic<uint64_t> submitted{0};
    std::atomic<uint64_t> completed{0};
    bool stop = false;
    bool started = false;

    void worker() {
        for (;;) {
            Job job;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] { return stop || !queue.empty(); });
                if (queue.empty()) {
                    if (stop) return;
                    continue;
                }
                job = std::move(queue.front());
                queue.pop_front();
            }
            if (!write_job(job)) errors.fetch_add(1);
            completed.fetch_add(1);
            cv_done.notify_all();
        }
    }

    static bool write_job(const Job& job) {
        std::FILE* f = std::fopen(job.path.c_str(), "wb");
        if (f == nullptr) return false;
        bool ok = std::fwrite(job.header, sizeof(uint64_t), 8, f) == 8;
        if (ok && !job.bytes.empty()) {
            ok = std::fwrite(job.bytes.data(), 1, job.bytes.size(), f) ==
                 job.bytes.size();
        }
        uint64_t tail = job.bytes.size();
        ok = ok && std::fwrite(&tail, sizeof(uint64_t), 1, f) == 1;
        ok = (std::fclose(f) == 0) && ok;
        return ok;
    }
};

WriterPool g_pool;
constexpr uint64_t kMagic = 0x514b41525241591aULL;  // "QKARRAY" tag

}  // namespace

extern "C" {

int qk_writer_init(int n_threads) {
    std::unique_lock<std::mutex> lk(g_pool.mu);
    if (g_pool.started) return 0;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 16) n_threads = 16;
    g_pool.stop = false;
    for (int i = 0; i < n_threads; ++i) {
        g_pool.threads.emplace_back([] { g_pool.worker(); });
    }
    g_pool.started = true;
    return 0;
}

long qk_write_async(const char* path, const void* data, uint64_t nbytes,
                    int dtype_code, int ndim, const uint64_t* shape) {
    if (!g_pool.started) return -1;
    if (ndim > 5) return -2;
    Job job;
    job.path = path;
    job.bytes.resize(nbytes);
    std::memcpy(job.bytes.data(), data, nbytes);
    job.header[0] = kMagic;
    job.header[1] = static_cast<uint64_t>(dtype_code);
    job.header[2] = static_cast<uint64_t>(ndim);
    for (int i = 0; i < 5; ++i) {
        job.header[3 + i] = (i < ndim) ? shape[i] : 0;
    }
    {
        std::lock_guard<std::mutex> lk(g_pool.mu);
        g_pool.queue.push_back(std::move(job));
    }
    g_pool.submitted.fetch_add(1);
    g_pool.cv.notify_one();
    return static_cast<long>(g_pool.submitted.load());
}

int qk_writer_drain() {
    std::unique_lock<std::mutex> lk(g_pool.mu);
    g_pool.cv_done.wait(lk, [] {
        return g_pool.completed.load() == g_pool.submitted.load();
    });
    return g_pool.errors.load();
}

int qk_writer_errors() { return g_pool.errors.load(); }

void qk_writer_shutdown() {
    {
        std::lock_guard<std::mutex> lk(g_pool.mu);
        g_pool.stop = true;
    }
    g_pool.cv.notify_all();
    for (auto& t : g_pool.threads) {
        if (t.joinable()) t.join();
    }
    g_pool.threads.clear();
    g_pool.started = false;
}

}  // extern "C"
