// External-environment IPC bridge (native client).
//
// C++ equivalent of the reference's CARLA bridge (libs/gymcpp/carla/
// carla_gym.h): a blocking socket client that exchanges length-prefixed
// multipart frames with an external simulator process. The reference used
// ZeroMQ pair sockets over ipc://; this implementation speaks the same framing
// as ppo_tpu/serve.py over unix/TCP sockets so the two interoperate.
//
// Frame layout: uint32 n_parts, then per part uint64 nbytes + raw bytes.
// Step exchange mirrors carla_gym.h:115-137: the client sends the raw float
// action buffer; the server replies with the multipart observation/reward/
// termination/truncation parts.
//
// C API (ctypes-consumed from ppo_tpu/envs/external.py):
//   ee_connect(path)                     -> handle (unix socket)
//   ee_connect_tcp(host, port)           -> handle
//   ee_send(handle, n_parts, sizes, data)-> 0/-1
//   ee_recv_nparts(handle)               -> n_parts (-1 on error)
//   ee_recv_part_size(handle)            -> size of next part
//   ee_recv_part(handle, buf, size)      -> 0/-1
//   ee_close(handle)

#include <arpa/inet.h>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

namespace {

bool send_all(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n) {
    ssize_t w = ::send(fd, p, n, 0);
    if (w <= 0) return false;
    p += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

bool recv_all(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

}  // namespace

extern "C" {

int ee_connect(const char* path) {
  int fd = ::socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, path, sizeof(addr.sun_path) - 1);
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    ::close(fd);
    return -1;
  }
  return fd;
}

int ee_connect_tcp(const char* host, int port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1 ||
      ::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    ::close(fd);
    return -1;
  }
  return fd;
}

int ee_send(int fd, uint32_t n_parts, const uint64_t* sizes, const uint8_t* const* parts) {
  if (!send_all(fd, &n_parts, 4)) return -1;
  for (uint32_t i = 0; i < n_parts; ++i) {
    if (!send_all(fd, &sizes[i], 8)) return -1;
    if (!send_all(fd, parts[i], sizes[i])) return -1;
  }
  return 0;
}

int ee_recv_nparts(int fd) {
  uint32_t n;
  if (!recv_all(fd, &n, 4)) return -1;
  return static_cast<int>(n);
}

int64_t ee_recv_part_size(int fd) {
  uint64_t n;
  if (!recv_all(fd, &n, 8)) return -1;
  return static_cast<int64_t>(n);
}

int ee_recv_part(int fd, uint8_t* buf, uint64_t size) {
  return recv_all(fd, buf, size) ? 0 : -1;
}

void ee_close(int fd) { ::close(fd); }

}  // extern "C"
