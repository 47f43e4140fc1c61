// mbd_launcher — fault-tolerant parallel experiment executor.
//
// The reference's multi-seed harness (mbd/scripts/run_mbd.py:17-39) runs
// seeds serially in-process; a single device fault kills the whole sweep.
// This native executor runs each experiment as an isolated subprocess with
// a wall-clock timeout and bounded retries, streams per-task status, and
// aggregates the JSON lines each worker prints on success. Concurrency is
// bounded (default 1 — one TPU chip) but scales to per-host fan-out for
// multi-host DCN sweeps, which is exactly where the reference's workload
// is embarrassingly parallel (SURVEY §5: DCN only for independent
// seeds/temps).
//
// Usage:
//   mbd_launcher [--timeout SEC] [--retries N] [--jobs J] \
//       [--out results.jsonl] -- CMD ARGS... {task}
// Task specs are read from stdin, one per line; "{task}" in the command is
// replaced by the spec. Workers must print one JSON line on success
// (anything on stdout starting with '{').
//
// Build: make -C native/launcher   (produces build/mbd_launcher)

#include <sys/types.h>
#include <sys/wait.h>

#include <algorithm>
#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <signal.h>
#include <unistd.h>

namespace {

struct Options {
  int timeout_sec = 3600;
  int retries = 1;
  int jobs = 1;
  std::string out_path;
  std::vector<std::string> cmd_template;
};

struct TaskResult {
  std::string task;
  bool ok = false;
  int attempts = 0;
  double wall_sec = 0.0;
  std::string json;  // last JSON line printed by the worker
};

// Run one task attempt; returns (exit_ok, json_line).
std::pair<bool, std::string> RunOnce(const Options& opt,
                                     const std::string& task) {
  int pipefd[2];
  if (pipe(pipefd) != 0) return {false, ""};

  pid_t pid = fork();
  if (pid < 0) return {false, ""};
  if (pid == 0) {
    // child: own process group so a timeout can kill the whole tree
    setpgid(0, 0);
    dup2(pipefd[1], STDOUT_FILENO);
    close(pipefd[0]);
    close(pipefd[1]);
    std::vector<std::string> argv_s;
    for (const auto& part : opt.cmd_template) {
      std::string p = part;
      size_t at;
      while ((at = p.find("{task}")) != std::string::npos)
        p.replace(at, 6, task);
      argv_s.push_back(p);
    }
    std::vector<char*> argv;
    for (auto& s : argv_s) argv.push_back(const_cast<char*>(s.c_str()));
    argv.push_back(nullptr);
    execvp(argv[0], argv.data());
    _exit(127);
  }

  close(pipefd[1]);
  // read pipe on a helper thread so the timeout watchdog stays simple
  std::string output;
  std::thread reader([&] {
    char buf[4096];
    ssize_t n;
    while ((n = read(pipefd[0], buf, sizeof(buf))) > 0)
      output.append(buf, static_cast<size_t>(n));
  });

  bool timed_out = false;
  int status = 0;
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::seconds(opt.timeout_sec);
  for (;;) {
    pid_t r = waitpid(pid, &status, WNOHANG);
    if (r == pid) break;
    if (r < 0 && errno != EINTR) break;
    if (std::chrono::steady_clock::now() > deadline) {
      timed_out = true;
      kill(-pid, SIGKILL);  // whole process group
      waitpid(pid, &status, 0);
      break;
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(100));
  }
  reader.join();
  close(pipefd[0]);

  bool ok = !timed_out && WIFEXITED(status) && WEXITSTATUS(status) == 0;
  // last line starting with '{' is the result record
  std::string json;
  size_t pos = 0;
  while (pos < output.size()) {
    size_t eol = output.find('\n', pos);
    if (eol == std::string::npos) eol = output.size();
    if (eol > pos && output[pos] == '{')
      json = output.substr(pos, eol - pos);
    pos = eol + 1;
  }
  if (json.empty()) ok = false;
  return {ok, json};
}

}  // namespace

int main(int argc, char** argv) {
  Options opt;
  int i = 1;
  for (; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--timeout" && i + 1 < argc) opt.timeout_sec = atoi(argv[++i]);
    else if (a == "--retries" && i + 1 < argc) opt.retries = atoi(argv[++i]);
    else if (a == "--jobs" && i + 1 < argc) opt.jobs = atoi(argv[++i]);
    else if (a == "--out" && i + 1 < argc) opt.out_path = argv[++i];
    else if (a == "--") { ++i; break; }
    else {
      std::cerr << "unknown flag: " << a << "\n";
      return 2;
    }
  }
  for (; i < argc; ++i) opt.cmd_template.push_back(argv[i]);
  if (opt.cmd_template.empty()) {
    std::cerr << "usage: mbd_launcher [flags] -- CMD ARGS... {task}\n";
    return 2;
  }

  std::vector<std::string> tasks;
  for (std::string line; std::getline(std::cin, line);)
    if (!line.empty()) tasks.push_back(line);

  std::mutex mu;
  std::queue<size_t> pending;
  for (size_t t = 0; t < tasks.size(); ++t) pending.push(t);
  std::vector<TaskResult> results(tasks.size());

  auto worker = [&] {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> lock(mu);
        if (pending.empty()) return;
        idx = pending.front();
        pending.pop();
      }
      TaskResult res;
      res.task = tasks[idx];
      auto t0 = std::chrono::steady_clock::now();
      for (int attempt = 0; attempt <= opt.retries; ++attempt) {
        res.attempts = attempt + 1;
        auto [ok, json] = RunOnce(opt, tasks[idx]);
        if (ok) {
          res.ok = true;
          res.json = json;
          break;
        }
        std::lock_guard<std::mutex> lock(mu);
        std::cerr << "[mbd_launcher] task '" << tasks[idx]
                  << "' attempt " << attempt + 1 << " failed\n";
      }
      res.wall_sec =
          std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
              .count();
      {
        std::lock_guard<std::mutex> lock(mu);
        std::cerr << "[mbd_launcher] task '" << res.task << "' "
                  << (res.ok ? "ok" : "FAILED") << " in " << res.wall_sec
                  << "s (" << res.attempts << " attempt(s))\n";
        results[idx] = std::move(res);
      }
    }
  };

  std::vector<std::thread> pool;
  int jobs = std::max(1, opt.jobs);
  for (int j = 0; j < jobs; ++j) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  std::ostream* out = &std::cout;
  std::ofstream file;
  if (!opt.out_path.empty()) {
    file.open(opt.out_path);
    out = &file;
  }
  int failures = 0;
  for (const auto& r : results) {
    if (r.ok) {
      *out << "{\"task\": \"" << r.task << "\", \"wall_sec\": " << r.wall_sec
           << ", \"attempts\": " << r.attempts << ", \"result\": " << r.json
           << "}\n";
    } else {
      ++failures;
      *out << "{\"task\": \"" << r.task << "\", \"failed\": true}\n";
    }
  }
  return failures == 0 ? 0 : 1;
}
