#include "replay.hpp"

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <unordered_map>

#include "json.hpp"

namespace magent_tpu {
namespace replay {

static std::string read_file(const std::string &path) {
    std::ifstream in(path);
    if (!in) throw std::runtime_error("cannot open " + path);
    std::ostringstream ss;
    ss << in.rdbuf();
    return ss.str();
}

// parse "rgba(r,g,b,a)"
static void parse_rgba(const std::string &s, Style &style) {
    unsigned r = 0, g = 0, b = 0;
    float a = 0;
    if (sscanf(s.c_str(), "rgba(%u,%u,%u,%f)", &r, &g, &b, &a) >= 3) {
        style.red = r;
        style.green = g;
        style.blue = b;
    }
}

void Config::load(const std::string &path) {
    frontend_json = read_file(path);
    auto root = json::parse(frontend_json);
    width = root->at("width").asUInt();
    height = root->at("height").asUInt();
    if (root->has("minimap-width"))
        minimap_width = root->at("minimap-width").asUInt();
    if (root->has("minimap-height"))
        minimap_height = root->at("minimap-height").asUInt();
    if (root->has("dynamic-file-directory"))
        data_path = root->at("dynamic-file-directory").asString();
    static_file.clear();
    if (root->has("static-file"))
        static_file = root->at("static-file").asString();

    styles.clear();
    if (root->has("group")) {
        for (const auto &g : root->at("group").arr) {
            Style st;
            st.width = g->at("width").asUInt();
            st.height = g->at("height").asUInt();
            parse_rgba(g->at("style").asString(), st);
            styles.push_back(st);
        }
    }
}

void Buffer::load(const std::string &path) {
    std::ifstream in(path);
    if (!in) throw std::runtime_error("cannot open " + path);

    // gridworld videos begin with an inline "W n" wall list; DiscreteSnake
    // videos start straight at "F" and keep walls in the config's
    // static-file (loaded by the caller) — accept both
    std::string tag;
    if (!(in >> tag)) throw std::runtime_error("empty replay " + path);
    obstacles.clear();
    if (tag == "W") {
        unsigned n_obstacles = 0;
        if (!(in >> n_obstacles))
            throw std::runtime_error("invalid wall header in " + path);
        obstacles.resize(n_obstacles);
        for (unsigned i = 0; i < n_obstacles; i++)
            if (!(in >> obstacles[i].first >> obstacles[i].second))
                throw std::runtime_error("truncated wall list");
        if (!(in >> tag)) tag.clear();
    }

    frames.clear();
    while (!tag.empty()) {
        if (tag != "F") throw std::runtime_error("invalid frame tag: " + tag);
        unsigned n_agents = 0, n_events = 0, n_breads = 0;
        if (!(in >> n_agents >> n_events >> n_breads))
            throw std::runtime_error("truncated frame header");
        Frame frame;
        frame.agents.resize(n_agents);
        std::unordered_map<int, int> index_of;
        for (unsigned i = 0; i < n_agents; i++) {
            AgentData &a = frame.agents[i];
            if (!(in >> a.id >> a.hp >> a.direction >> a.x >> a.y >> a.group))
                throw std::runtime_error("truncated agent list");
            index_of[a.id] = (int)i;
        }
        frame.events.resize(n_events);
        for (unsigned i = 0; i < n_events; i++) {
            EventData &e = frame.events[i];
            if (!(in >> e.type >> e.agent_id >> e.x >> e.y))
                throw std::runtime_error("truncated event list");
            auto it = index_of.find(e.agent_id);
            e.agent_index = it == index_of.end() ? -1 : it->second;
        }
        frame.breads.resize(n_breads);
        for (unsigned i = 0; i < n_breads; i++) {
            BreadData &b = frame.breads[i];
            if (!(in >> b.x >> b.y >> b.hp))
                throw std::runtime_error("truncated bread list");
        }
        frames.push_back(std::move(frame));
        if (!(in >> tag)) tag.clear();
    }
}

std::string Session::handle(const std::string &message) {
    try {
        if (message.empty()) return "einvalid message";
        if (message[0] == 'l') {
            size_t pos = message.find_first_of(',');
            if (pos == std::string::npos) return "einvalid load operation";
            std::string conf_path = message.substr(1, pos - 1);
            std::string data_file = message.substr(pos + 1);
            config_.load(conf_path);
            try {
                buffer_.load(config_.data_path + "/" + data_file);
            } catch (const std::exception &) {
                // fall back to the config.json directory (the generator
                // writes "dynamic-file-directory": "." like the reference)
                size_t slash = conf_path.find_last_of('/');
                std::string dir =
                    slash == std::string::npos ? "." : conf_path.substr(0, slash);
                buffer_.load(dir + "/" + data_file);
            }
            if (buffer_.obstacles.empty() && !config_.static_file.empty()) {
                // snake-style replays: walls live in the config's static
                // file ("N" then x y lines), resolved next to config.json
                size_t slash = conf_path.find_last_of('/');
                std::string dir =
                    slash == std::string::npos ? "." : conf_path.substr(0, slash);
                std::ifstream sf(dir + "/" + config_.static_file);
                unsigned n = 0;
                if (sf >> n) {
                    buffer_.obstacles.resize(n);
                    for (unsigned i = 0; i < n; i++)
                        if (!(sf >> buffer_.obstacles[i].first >>
                              buffer_.obstacles[i].second)) {
                            buffer_.obstacles.resize(i);
                            break;
                        }
                }
            }
            loaded_ = true;
            return "i" + std::to_string(buffer_.frames.size()) + "|" +
                   config_.frontend_json;
        }
        if (message[0] == 'p') {
            if (!loaded_) return "eno replay loaded";
            int frame_id, xmin, ymin, xmax, ymax;
            if (sscanf(message.c_str() + 1, "%d%d%d%d%d", &frame_id, &xmin,
                       &ymin, &xmax, &ymax) != 5)
                return "einvalid pick operation";
            if (frame_id < 0 || (size_t)frame_id >= buffer_.frames.size())
                return "eframe out of range";
            return encode_frame(buffer_.frames[(size_t)frame_id],
                                Window{xmin, ymin, xmax, ymax});
        }
        return "einvalid message";
    } catch (const std::exception &e) {
        return std::string("e") + e.what();
    }
}

std::string Session::encode_frame(const Frame &frame, const Window &window) const {
    std::string out("f");
    const unsigned n_styles = (unsigned)config_.styles.size();

    // events inside the window (or whose agent is), remembering their agents
    std::unordered_map<int, bool> has_event;
    bool first = true;
    for (const EventData &e : frame.events) {
        bool ok = window.accept(e.x, e.y);
        if (!ok && e.agent_index >= 0) {
            const AgentData &a = frame.agents[(size_t)e.agent_index];
            const Style &st = config_.styles[(size_t)a.group % std::max(1u, n_styles)];
            unsigned w = st.width, h = st.height;
            if (a.direction % 180 != 0) std::swap(w, h);
            ok = window.accept(a.x, a.y, (int)w, (int)h);
        }
        if (ok) {
            has_event[e.agent_id] = true;
            if (!first) out += "|";
            out += std::to_string(e.type) + ' ' + std::to_string(e.agent_id) +
                   ' ' + std::to_string(e.x) + ' ' + std::to_string(e.y);
            first = false;
        }
    }
    out += ";";

    // agents in the window + global minimap / per-group counters
    std::vector<unsigned> minimap(config_.minimap_width *
                                      config_.minimap_height * n_styles,
                                  0u);
    std::vector<unsigned> counts(n_styles, 0u);
    first = true;
    for (const AgentData &a : frame.agents) {
        const Style &st = config_.styles[(size_t)a.group % std::max(1u, n_styles)];
        unsigned w = st.width, h = st.height;
        if (a.direction % 180 != 0) std::swap(w, h);
        if (has_event.count(a.id) || window.accept(a.x, a.y, (int)w, (int)h)) {
            if (!first) out += "|";
            out += std::to_string(a.id) + ' ' + std::to_string(a.x) + ' ' +
                   std::to_string(a.y) + ' ' + std::to_string(a.group) + ' ' +
                   std::to_string(a.direction) + ' ' + std::to_string(a.hp);
            first = false;
        }
        if ((unsigned)a.group < n_styles) counts[(size_t)a.group]++;
        unsigned mx = (unsigned)(1.0 * a.x / config_.width * config_.minimap_width);
        unsigned my = (unsigned)(1.0 * a.y / config_.height * config_.minimap_height);
        if (mx < config_.minimap_width && my < config_.minimap_height &&
            (unsigned)a.group < n_styles)
            minimap[(my * config_.minimap_width + mx) * n_styles +
                    (unsigned)a.group]++;
    }
    out += ";";

    // breads (food) in the window
    first = true;
    for (const BreadData &b : frame.breads) {
        if (window.accept(b.x, b.y)) {
            if (!first) out += "|";
            out += std::to_string(b.x) + ' ' + std::to_string(b.y) + ' ' +
                   std::to_string(b.hp);
            first = false;
        }
    }
    out += ";";

    // obstacles in the window
    first = true;
    for (const auto &o : buffer_.obstacles) {
        if (window.accept(o.first, o.second)) {
            if (!first) out += "|";
            out += std::to_string(o.first) + " " + std::to_string(o.second);
            first = false;
        }
    }
    out += ";";

    // minimap pixels packed as R<<24|B<<16|G<<8|0xFF (reference layout,
    // text.cc:143-166 — note the swapped blue/green, kept for parity)
    first = true;
    for (unsigned i = 0; i < config_.minimap_width * config_.minimap_height; i++) {
        if (!first) out += " ";
        unsigned sum = 0;
        for (unsigned j = 0; j < n_styles; j++) sum += minimap[i * n_styles + j];
        unsigned value;
        if (sum == 0) {
            value = 0xFFFFFFFFu;
        } else {
            double red = 0, blue = 0, green = 0;
            for (unsigned j = 0; j < n_styles; j++) {
                red += 1.0 * config_.styles[j].red * minimap[i * n_styles + j] / sum;
                blue += 1.0 * config_.styles[j].blue * minimap[i * n_styles + j] / sum;
                green += 1.0 * config_.styles[j].green * minimap[i * n_styles + j] / sum;
            }
            value = ((unsigned)red << 24) | ((unsigned)blue << 16) |
                    ((unsigned)green << 8) | 0xFFu;
        }
        out += std::to_string(value);
        first = false;
    }

    out += ";";
    first = true;
    for (unsigned i = 0; i < n_styles; i++) {
        if (!first) out += " ";
        out += std::to_string(counts[i]);
        first = false;
    }
    return out;
}

}  // namespace replay
}  // namespace magent_tpu
