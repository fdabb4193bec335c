// Replay render server: serves recorded frames (config.json + video_N.txt)
// to the HTML/Canvas frontend over WebSocket.
//
// CLI parity with the reference render backend (reference:
// src/render/backend/utility/config.cc:8-57): --port/-p, --quiet/-q.
#include <getopt.h>

#include <cstdio>
#include <cstdlib>

#include "replay.hpp"
#include "ws.hpp"

int main(int argc, char **argv) {
    uint16_t port = 9030;
    bool quiet = false;

    static option long_opts[] = {
        {"port", required_argument, nullptr, 'p'},
        {"quiet", no_argument, nullptr, 'q'},
        {"help", no_argument, nullptr, 'h'},
        {nullptr, 0, nullptr, 0},
    };
    int c;
    while ((c = getopt_long(argc, argv, "p:qh", long_opts, nullptr)) != -1) {
        switch (c) {
            case 'p':
                port = (uint16_t)atoi(optarg);
                break;
            case 'q':
                quiet = true;
                break;
            case 'h':
            default:
                printf("usage: render [--port PORT] [--quiet]\n");
                return c == 'h' ? 0 : 1;
        }
    }

    try {
        magent_tpu::replay::Session session;
        magent_tpu::ws::Server server(port, quiet);
        server.run([&session](const std::string &msg) {
            return session.handle(msg);
        });
    } catch (const std::exception &e) {
        fprintf(stderr, "fatal: %s\n", e.what());
        return 1;
    }
    return 0;
}
