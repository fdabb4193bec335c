// Replay data model + text protocol for the WebSocket replay server.
//
// Loads the replay files written by magent_tpu.render.generator
// (config.json + video_<k>.txt, same format as the reference's
// RenderGenerator) and answers the frontend's text protocol:
//   "l<config_path>,<video_file>"          -> "i<nframes>|<config json>"
//   "p<frame> <xmin> <ymin> <xmax> <ymax>" -> "f<events>;<agents>;<breads>;
//                                              <obstacles>;<minimap>;<counts>"
//   on error                               -> "e<message>"
// (protocol parity with reference: src/render/backend/text.cc:29-185,
// data model parity with src/render/backend/data.{h,cc}).
#ifndef MAGENT_TPU_RENDER_REPLAY_HPP_
#define MAGENT_TPU_RENDER_REPLAY_HPP_

#include <string>
#include <vector>

namespace magent_tpu {
namespace replay {

struct AgentData {
    int id = 0, hp = 0, direction = 0, x = 0, y = 0, group = 0;
};

struct EventData {
    int type = 0, agent_index = -1, x = 0, y = 0;
    int agent_id = 0;
};

struct BreadData {
    int x = 0, y = 0, hp = 0;
};

struct Frame {
    std::vector<AgentData> agents;
    std::vector<EventData> events;
    std::vector<BreadData> breads;
};

struct Style {
    unsigned width = 1, height = 1;
    unsigned red = 0, green = 0, blue = 0;
};

struct Window {
    int xmin, ymin, xmax, ymax;
    // point / rect acceptance matches the reference exactly
    // (reference: src/render/backend/data.cc:23-30)
    bool accept(int x, int y) const {
        return xmin <= x && ymin <= y && x <= xmax && y <= ymax;
    }
    bool accept(int x, int y, int w, int h) const {
        return ((xmin <= x && x <= xmax) || (xmin <= x + w && x + w <= xmax)) &&
               ((ymin <= y && y <= ymax) || (ymin <= y + h && y + h <= ymax));
    }
};

class Config {
public:
    void load(const std::string &path);

    unsigned width = 0, height = 0;
    unsigned minimap_width = 300, minimap_height = 250;
    std::string data_path = ".";
    std::string static_file;  // wall list for games that keep walls out of the video (snake)
    std::vector<Style> styles;
    std::string frontend_json;  // raw config text echoed to the frontend
};

class Buffer {
public:
    void load(const std::string &path);

    std::vector<std::pair<int, int>> obstacles;
    std::vector<Frame> frames;
};

// Handle one protocol message; never throws (errors become "e..." replies).
class Session {
public:
    std::string handle(const std::string &message);

private:
    Config config_;
    Buffer buffer_;
    bool loaded_ = false;

    std::string encode_frame(const Frame &frame, const Window &window) const;
};

}  // namespace replay
}  // namespace magent_tpu

#endif  // MAGENT_TPU_RENDER_REPLAY_HPP_
