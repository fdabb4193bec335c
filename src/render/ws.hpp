// Minimal RFC 6455 WebSocket server (single client, blocking).
//
// Replaces the reference's websocketpp/boost stack (reference:
// src/render/backend/websocket.{h,cc}) with a self-contained POSIX
// implementation: HTTP Upgrade handshake (SHA-1 + base64 of the client
// key), masked client text frames in, unmasked server text frames out.
// Like the reference, the server serves one client at a time and keeps
// accepting new connections when the client disconnects.
#ifndef MAGENT_TPU_RENDER_WS_HPP_
#define MAGENT_TPU_RENDER_WS_HPP_

#include <cstdint>
#include <functional>
#include <string>

namespace magent_tpu {
namespace ws {

// SHA-1 (FIPS 180-1) of a byte string; 20-byte digest.
void sha1(const std::string &data, unsigned char digest[20]);

// Standard base64 encoding.
std::string base64(const unsigned char *data, size_t len);

class Server {
public:
    explicit Server(uint16_t port, bool quiet = false);
    ~Server();

    // Serve forever: accept a client, run the message loop, repeat.
    // `on_message` is called for every complete text message; its return
    // value is sent back as one text frame.
    void run(const std::function<std::string(const std::string &)> &on_message);

private:
    int listen_fd_ = -1;
    int client_fd_ = -1;
    uint16_t port_;
    bool quiet_;

    bool handshake();
    bool read_exact(void *buf, size_t n);
    bool send_all(const void *buf, size_t n);
    bool recv_message(std::string &out);
    bool send_text(const std::string &payload);
};

}  // namespace ws
}  // namespace magent_tpu

#endif  // MAGENT_TPU_RENDER_WS_HPP_
