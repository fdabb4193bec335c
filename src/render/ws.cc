#include "ws.hpp"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstring>
#include <sstream>
#include <stdexcept>
#include <vector>

namespace magent_tpu {
namespace ws {

// --------------------------------------------------------------------- SHA-1
void sha1(const std::string &data, unsigned char digest[20]) {
    uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                     0xC3D2E1F0u};
    std::vector<unsigned char> msg(data.begin(), data.end());
    uint64_t bitlen = (uint64_t)msg.size() * 8;
    msg.push_back(0x80);
    while (msg.size() % 64 != 56) msg.push_back(0);
    for (int i = 7; i >= 0; i--) msg.push_back((unsigned char)(bitlen >> (i * 8)));

    auto rol = [](uint32_t v, int s) { return (v << s) | (v >> (32 - s)); };
    for (size_t chunk = 0; chunk < msg.size(); chunk += 64) {
        uint32_t w[80];
        for (int i = 0; i < 16; i++)
            w[i] = (uint32_t)msg[chunk + 4 * i] << 24 |
                   (uint32_t)msg[chunk + 4 * i + 1] << 16 |
                   (uint32_t)msg[chunk + 4 * i + 2] << 8 |
                   (uint32_t)msg[chunk + 4 * i + 3];
        for (int i = 16; i < 80; i++)
            w[i] = rol(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);

        uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
        for (int i = 0; i < 80; i++) {
            uint32_t f, k;
            if (i < 20) { f = (b & c) | ((~b) & d); k = 0x5A827999u; }
            else if (i < 40) { f = b ^ c ^ d; k = 0x6ED9EBA1u; }
            else if (i < 60) { f = (b & c) | (b & d) | (c & d); k = 0x8F1BBCDCu; }
            else { f = b ^ c ^ d; k = 0xCA62C1D6u; }
            uint32_t tmp = rol(a, 5) + f + e + k + w[i];
            e = d; d = c; c = rol(b, 30); b = a; a = tmp;
        }
        h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
    }
    for (int i = 0; i < 5; i++) {
        digest[4 * i] = (unsigned char)(h[i] >> 24);
        digest[4 * i + 1] = (unsigned char)(h[i] >> 16);
        digest[4 * i + 2] = (unsigned char)(h[i] >> 8);
        digest[4 * i + 3] = (unsigned char)(h[i]);
    }
}

std::string base64(const unsigned char *data, size_t len) {
    static const char tbl[] =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    std::string out;
    for (size_t i = 0; i < len; i += 3) {
        uint32_t v = (uint32_t)data[i] << 16;
        if (i + 1 < len) v |= (uint32_t)data[i + 1] << 8;
        if (i + 2 < len) v |= (uint32_t)data[i + 2];
        out += tbl[(v >> 18) & 63];
        out += tbl[(v >> 12) & 63];
        out += (i + 1 < len) ? tbl[(v >> 6) & 63] : '=';
        out += (i + 2 < len) ? tbl[v & 63] : '=';
    }
    return out;
}

// -------------------------------------------------------------------- server
Server::Server(uint16_t port, bool quiet) : port_(port), quiet_(quiet) {
    listen_fd_ = socket(AF_INET, SOCK_STREAM, 0);
    if (listen_fd_ < 0) throw std::runtime_error("socket() failed");
    int yes = 1;
    setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &yes, sizeof(yes));

    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_ANY);
    addr.sin_port = htons(port);
    if (bind(listen_fd_, (sockaddr *)&addr, sizeof(addr)) < 0)
        throw std::runtime_error("bind() failed (port in use?)");
    if (listen(listen_fd_, 1) < 0) throw std::runtime_error("listen() failed");
}

Server::~Server() {
    if (client_fd_ >= 0) close(client_fd_);
    if (listen_fd_ >= 0) close(listen_fd_);
}

bool Server::read_exact(void *buf, size_t n) {
    auto *p = (unsigned char *)buf;
    while (n > 0) {
        ssize_t r = recv(client_fd_, p, n, 0);
        if (r <= 0) return false;
        p += r;
        n -= (size_t)r;
    }
    return true;
}

bool Server::send_all(const void *buf, size_t n) {
    auto *p = (const unsigned char *)buf;
    while (n > 0) {
        ssize_t r = send(client_fd_, p, n, 0);
        if (r <= 0) return false;
        p += r;
        n -= (size_t)r;
    }
    return true;
}

bool Server::handshake() {
    // read the HTTP request until the blank line
    std::string req;
    char c;
    while (req.find("\r\n\r\n") == std::string::npos) {
        if (!read_exact(&c, 1)) return false;
        req += c;
        if (req.size() > 65536) return false;
    }
    const std::string key_hdr = "Sec-WebSocket-Key:";
    size_t pos = req.find(key_hdr);
    if (pos == std::string::npos) return false;
    size_t beg = pos + key_hdr.size();
    while (beg < req.size() && req[beg] == ' ') beg++;
    size_t end = req.find("\r\n", beg);
    std::string key = req.substr(beg, end - beg);

    unsigned char digest[20];
    sha1(key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11", digest);
    std::string accept = base64(digest, 20);

    std::ostringstream resp;
    resp << "HTTP/1.1 101 Switching Protocols\r\n"
         << "Upgrade: websocket\r\n"
         << "Connection: Upgrade\r\n"
         << "Sec-WebSocket-Accept: " << accept << "\r\n\r\n";
    const std::string s = resp.str();
    return send_all(s.data(), s.size());
}

bool Server::recv_message(std::string &out) {
    out.clear();
    bool fin = false;
    while (!fin) {
        unsigned char hdr[2];
        if (!read_exact(hdr, 2)) return false;
        fin = (hdr[0] & 0x80) != 0;
        unsigned op = hdr[0] & 0x0F;
        bool masked = (hdr[1] & 0x80) != 0;
        uint64_t len = hdr[1] & 0x7F;
        if (len == 126) {
            unsigned char ext[2];
            if (!read_exact(ext, 2)) return false;
            len = ((uint64_t)ext[0] << 8) | ext[1];
        } else if (len == 127) {
            unsigned char ext[8];
            if (!read_exact(ext, 8)) return false;
            len = 0;
            for (int i = 0; i < 8; i++) len = (len << 8) | ext[i];
        }
        unsigned char mask[4] = {0, 0, 0, 0};
        if (masked && !read_exact(mask, 4)) return false;

        std::string payload(len, '\0');
        if (len && !read_exact(&payload[0], len)) return false;
        if (masked)
            for (uint64_t i = 0; i < len; i++) payload[i] ^= mask[i & 3];

        if (op == 0x8) {  // close
            unsigned char frame[2] = {0x88, 0x00};
            send_all(frame, 2);
            return false;
        }
        if (op == 0x9) {  // ping -> pong
            std::string pong = "\x8A";
            pong += (char)payload.size();
            pong += payload;
            if (!send_all(pong.data(), pong.size())) return false;
            fin = false;
            continue;
        }
        if (op == 0xA) {  // pong
            fin = false;
            continue;
        }
        out += payload;
    }
    return true;
}

bool Server::send_text(const std::string &payload) {
    std::string hdr;
    hdr += (char)0x81;  // FIN + text
    size_t n = payload.size();
    if (n < 126) {
        hdr += (char)n;
    } else if (n < 65536) {
        hdr += (char)126;
        hdr += (char)(n >> 8);
        hdr += (char)(n & 0xFF);
    } else {
        hdr += (char)127;
        for (int i = 7; i >= 0; i--) hdr += (char)((uint64_t)n >> (i * 8));
    }
    return send_all(hdr.data(), hdr.size()) && send_all(payload.data(), n);
}

void Server::run(const std::function<std::string(const std::string &)> &on_message) {
    while (true) {
        if (!quiet_) fprintf(stderr, "[render] listening on port %u\n", port_);
        client_fd_ = accept(listen_fd_, nullptr, nullptr);
        if (client_fd_ < 0) continue;
        int yes = 1;
        setsockopt(client_fd_, IPPROTO_TCP, TCP_NODELAY, &yes, sizeof(yes));
        if (!handshake()) {
            close(client_fd_);
            client_fd_ = -1;
            continue;
        }
        if (!quiet_) fprintf(stderr, "[render] client connected\n");
        std::string msg;
        while (recv_message(msg)) {
            std::string reply = on_message(msg);
            if (!send_text(reply)) break;
        }
        if (!quiet_) fprintf(stderr, "[render] client disconnected\n");
        close(client_fd_);
        client_fd_ = -1;
    }
}

}  // namespace ws
}  // namespace magent_tpu
