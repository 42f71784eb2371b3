// llmvox_loadgen — native concurrent load generator for the streaming
// TTS HTTP API.
//
// The reference ships only a Python client (client/endpoints.py); for
// load-testing a production serving deployment a GIL-free client is the
// right tool: each worker thread opens its own connection, POSTs /tts,
// streams the chunked float32 body, and records first-chunk latency and
// bytes/second. Results print as one JSON line per worker plus an
// aggregate, so the output feeds the same dashboards as bench.py.
//
//   ./llmvox_loadgen HOST PORT N_WORKERS N_REQUESTS [TEXT]
//
// Plain POSIX sockets + std::thread — no third-party dependencies.
#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct WorkerStats {
  double first_chunk_ms_sum = 0.0;
  double wall_s = 0.0;
  long bytes = 0;
  int completed = 0;
  int failed = 0;
};

int dial(const char* host, int port) {
  addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  char portbuf[16];
  snprintf(portbuf, sizeof portbuf, "%d", port);
  if (getaddrinfo(host, portbuf, &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

// Minimal JSON string escape for the request body.
std::string escape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') out.push_back('\\');
    out.push_back(c);
  }
  return out;
}

bool one_request(const char* host, int port, const std::string& text,
                 WorkerStats* st) {
  int fd = dial(host, port);
  if (fd < 0) return false;
  std::string body = "{\"text\": \"" + escape(text) + "\"}";
  std::string req =
      "POST /tts HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
      "Content-Length: " + std::to_string(body.size()) +
      "\r\nConnection: close\r\n\r\n" + body;
  auto t0 = Clock::now();
  if (send(fd, req.data(), req.size(), 0) < 0) {
    close(fd);
    return false;
  }
  char buf[65536];
  bool got_first = false;
  bool in_body = false;
  long bytes = 0;
  std::string head;
  for (;;) {
    ssize_t n = recv(fd, buf, sizeof buf, 0);
    if (n <= 0) break;
    if (!in_body) {
      head.append(buf, n);
      size_t p = head.find("\r\n\r\n");
      if (p == std::string::npos) continue;
      in_body = true;
      n = static_cast<ssize_t>(head.size() - p - 4);  // body bytes so far
    }
    if (n > 0 && !got_first) {
      got_first = true;
      st->first_chunk_ms_sum +=
          std::chrono::duration<double, std::milli>(Clock::now() - t0)
              .count();
    }
    bytes += n;
  }
  close(fd);
  st->wall_s += std::chrono::duration<double>(Clock::now() - t0).count();
  st->bytes += bytes;
  if (got_first && bytes > 0) {
    st->completed++;
    return true;
  }
  st->failed++;
  return false;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s HOST PORT N_WORKERS N_REQUESTS [TEXT]\n",
            argv[0]);
    return 2;
  }
  const char* host = argv[1];
  int port = atoi(argv[2]);
  int n_workers = atoi(argv[3]);
  int n_requests = atoi(argv[4]);
  std::string text = argc > 5 ? argv[5] : "Load test sentence.";

  std::vector<WorkerStats> stats(n_workers);
  std::atomic<int> remaining{n_requests};
  auto t0 = Clock::now();
  std::vector<std::thread> threads;
  threads.reserve(n_workers);
  for (int w = 0; w < n_workers; ++w) {
    threads.emplace_back([&, w] {
      while (remaining.fetch_sub(1) > 0) {
        one_request(host, port, text, &stats[w]);
      }
    });
  }
  for (auto& t : threads) t.join();
  double wall = std::chrono::duration<double>(Clock::now() - t0).count();

  WorkerStats agg;
  for (const auto& s : stats) {
    agg.first_chunk_ms_sum += s.first_chunk_ms_sum;
    agg.wall_s += s.wall_s;
    agg.bytes += s.bytes;
    agg.completed += s.completed;
    agg.failed += s.failed;
  }
  double mean_first =
      agg.completed ? agg.first_chunk_ms_sum / agg.completed : -1.0;
  double audio_s = agg.bytes / 4.0 / 24000.0;  // float32 @ 24 kHz
  printf(
      "{\"completed\": %d, \"failed\": %d, \"mean_first_chunk_ms\": %.1f, "
      "\"audio_s\": %.2f, \"wall_s\": %.2f, \"aggregate_rtf\": %.2f}\n",
      agg.completed, agg.failed, mean_first, audio_s, wall,
      wall > 0 ? audio_s / wall : 0.0);
  return agg.failed == 0 ? 0 : 1;
}
